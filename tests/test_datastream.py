"""Data streams + rollover: trailing-condition semantics, generation
immutability of the read plan, search == single union index, state
atomicity contracts."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.pipelines.datastream import (
    append_datastream,
    create_datastream,
    datastream_generations,
    datastream_search,
)
from mini_ivf_ray.sources.pages import generate_pages


def _batches(n_batches, per=120):
    import pyarrow as pa

    tables = []
    for b in range(n_batches):
        t = generate_pages(per, seed=100 + b, vocab_size=300, dup_frac=0.0)
        # disjoint url (hence doc-id) spaces per batch — the stream's
        # globally-unique-ids contract
        urls = pa.array(
            [
                u.replace("https://", f"https://b{b}-", 1)
                for u in t["url"].to_pylist()
            ],
            type=pa.string(),
        )
        tables.append(t.set_column(0, "url", urls))
    return tables


def test_rollover_trails_condition_and_search_matches_union(tmp_path):
    cfg = PipelineConfig(num_partitions=4, topk=10)
    ds_dir = str(tmp_path / "stream")
    create_datastream(ds_dir)
    tabs = _batches(3)
    # max_docs 150: batch 1 (<=120 docs) stays open, batch 2 crosses
    # and seals, batch 3 opens gen-2
    infos = []
    for t in tabs:
        infos.append(
            append_datastream(
                ds_dir,
                lambda t=t: ray.data.from_arrow(t),
                cfg,
                max_docs_per_gen=150,
            )
        )
    assert infos[0]["generation"] == "gen-000001" and not infos[0]["rolled"]
    assert infos[1]["generation"] == "gen-000001" and infos[1]["rolled"]
    assert infos[2]["generation"] == "gen-000002" and not infos[2]["rolled"]
    gens = datastream_generations(ds_dir)
    assert len(gens) == 2
    # stream search == ONE index over the union corpus, bit-identical
    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.pipelines.query import search

    import pyarrow as pa

    union = pa.concat_tables(tabs)
    uidx = str(tmp_path / "union")
    build_index(lambda: ray.data.from_arrow(union), uidx, cfg, dedup=False)
    queries = [(0, "the data web"), (1, "w00042 of")]
    got = datastream_search(ds_dir, queries, cfg).sort_values(
        ["query_id", "rank"]
    )
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    want = (
        search(uidx, qds, cfg)
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    assert np.array_equal(
        got["doc_id"].to_numpy().astype(np.uint64),
        want["doc_id"].to_numpy().astype(np.uint64),
    )
    assert np.array_equal(
        got["score"].to_numpy(), want["score"].to_numpy()
    )


def test_contracts(tmp_path):
    cfg = PipelineConfig(num_partitions=4, topk=10)
    ds_dir = str(tmp_path / "s2")
    create_datastream(ds_dir)
    with pytest.raises(FileExistsError):
        create_datastream(ds_dir)
    with pytest.raises(ValueError, match="no generations"):
        datastream_search(ds_dir, [(0, "x")], cfg)
    with pytest.raises(ValueError, match="max_docs_per_gen"):
        append_datastream(ds_dir, lambda: None, cfg, max_docs_per_gen=0)
