"""Salted skew-splitting of head terms (north_star): with a low
hot_df_threshold the Zipf head terms split across partitions by doc_id
range; results must stay rank-identical and df/idf exact."""

import numpy as np

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.pipelines.build import build_index
from mini_ivf_ray.pipelines.query import brute_force_topk, search
from mini_ivf_ray.sources.pages import generate_pages
from mini_ivf_ray.sources.segments import SegmentReader
from mini_ivf_ray.stages.prepare import prepare_documents
from mini_ivf_ray.state.stats import CorpusStats


def test_salted_build_rank_identical(tmp_path):
    cfg = PipelineConfig(num_partitions=4, hot_df_threshold=50, topk=10)
    pages = generate_pages(600, seed=41, vocab_size=300)
    idx = str(tmp_path / "salted")
    build_index(lambda: ray.data.from_arrow(pages), idx, cfg)

    stats = CorpusStats.load(idx)
    salts = stats.salt_counts(cfg)
    assert salts, "expected Zipf head terms above threshold"
    hot = max(salts, key=salts.get)
    locs = stats.term_locations(hot, cfg)
    assert len(locs) == salts[hot] > 1

    # the hot term's blocks, merged across partitions, are globally sorted
    reader = SegmentReader(idx)
    blocks = reader.term_blocks(hot, locs)
    assert blocks.n_postings == stats.df[hot]
    assert blocks.df == stats.df[hot]  # global df carried into every sub-list
    assert np.all(blocks.firsts[1:] > blocks.lasts[:-1])

    docs = prepare_documents(ray.data.from_arrow(pages), cfg).to_pandas()
    queries = [(0, hot), (1, f"{hot} w00042"), (2, "the data web time")]
    oracle = brute_force_topk(docs, queries, cfg).sort_values(["query_id", "rank"])
    qds = ray.data.from_items([{"query_id": q, "text": t} for q, t in queries])
    res = search(idx, qds, cfg).to_pandas().sort_values(["query_id", "rank"])
    np.testing.assert_array_equal(
        res["doc_id"].to_numpy().astype(np.uint64),
        oracle["doc_id"].to_numpy().astype(np.uint64),
    )
    np.testing.assert_array_equal(res["score"].to_numpy(), oracle["score"].to_numpy())


def test_unsalted_and_salted_indexes_agree(tmp_path):
    """Same corpus indexed with and without salting must answer
    identically — salting is a physical layout choice only."""
    pages = generate_pages(300, seed=43, vocab_size=200)
    cfg_a = PipelineConfig(num_partitions=4, hot_df_threshold=10**9)
    cfg_b = PipelineConfig(num_partitions=4, hot_df_threshold=30)
    ia, ib = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(lambda: ray.data.from_arrow(pages), ia, cfg_a)
    build_index(lambda: ray.data.from_arrow(pages), ib, cfg_b)
    queries = [(0, "the of data"), (1, "w00017 w00099 page"), (2, "time web")]
    qds = ray.data.from_items([{"query_id": q, "text": t} for q, t in queries])
    ra = search(ia, qds, cfg_a).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    rb = search(ib, qds, cfg_b).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert ra.equals(rb)


def test_distinct_users_per_window_matches_pandas():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from mini_ivf_ray.pipelines.events import distinct_users_per_window

    rng = np.random.default_rng(23)
    n = 20_000
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts = base + rng.integers(0, 86_400_000_000 * 3, n).astype("timedelta64[us]")
    users = rng.integers(0, 400, n)  # heavy repeats: combiner must dedup
    tbl = pa.table({"ts": pa.array(ts, type=pa.timestamp("us")),
                    "user_id": pa.array(users, type=pa.int64())})
    got = (
        distinct_users_per_window(ray.data.from_arrow(tbl).repartition(16))
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    win = ts.astype("datetime64[s]").astype(np.int64) // 3600 * 3600
    want = (
        pd.DataFrame({"w": win, "u": users})
        .groupby("w")["u"]
        .nunique()
        .reset_index()
        .rename(columns={"w": "window_start", "u": "n_users"})
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
