"""Auto-compaction policy (maintenance.index_epochs / maybe_compact +
append_index(auto_compact_epochs=...)): epoch accounting, trigger
threshold, and result identity across the compaction boundary."""

import numpy as np
import pandas as pd

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.pipelines.append import append_index
from mini_ivf_ray.pipelines.build import build_index
from mini_ivf_ray.pipelines.maintenance import index_epochs, maybe_compact
from mini_ivf_ray.pipelines.query import search
from mini_ivf_ray.sources.pages import generate_pages

QUERIES = ["the data", "web page time", "a of"]


def _topk(idx, cfg):
    qds = ray.data.from_items(
        [{"query_id": i, "text": t} for i, t in enumerate(QUERIES)]
    )
    df = search(idx, qds, cfg, share=False).to_pandas()
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _slices(n=600, parts=3, seed=91):
    pages = generate_pages(n, seed=seed, vocab_size=400, dup_frac=0.0)
    step = n // parts
    return [pages.slice(i * step, step) for i in range(parts)]


def test_epoch_count_and_policy_trigger(tmp_path):
    cfg = PipelineConfig(num_partitions=4)
    a, b, c = _slices()
    idx = str(tmp_path / "idx")
    build_index(lambda: ray.data.from_arrow(a), idx, cfg)
    assert index_epochs(idx, cfg) == 1
    append_index(lambda: ray.data.from_arrow(b), idx, cfg)
    assert index_epochs(idx, cfg) == 2
    # below threshold: no-op
    res = maybe_compact(idx, cfg, max_epochs=2)
    assert res == {
        "compacted": False,
        "epochs_before": 2,
        "epochs_after": 2,
        "manifest": None,
    }
    before = _topk(idx, cfg)
    # above threshold: compacts back to a single epoch
    res = maybe_compact(idx, cfg, max_epochs=1)
    assert res["compacted"] and res["epochs_before"] == 2
    assert res["epochs_after"] == 1 == index_epochs(idx, cfg)
    after = _topk(idx, cfg)
    pd.testing.assert_frame_equal(before, after)
    assert list(before["score"]) == list(after["score"])  # bit-identical
    # ...and the third slice appends cleanly onto the compacted index
    append_index(lambda: ray.data.from_arrow(c), idx, cfg)
    assert index_epochs(idx, cfg) == 2


def test_append_auto_compact_hook(tmp_path):
    cfg = PipelineConfig(num_partitions=4)
    a, b, c = _slices(seed=92)
    idx = str(tmp_path / "idx")
    build_index(lambda: ray.data.from_arrow(a), idx, cfg)
    meta = append_index(
        lambda: ray.data.from_arrow(b), idx, cfg, auto_compact_epochs=4
    )
    # 2 epochs <= 4: no compaction, incremental lineage intact
    assert index_epochs(idx, cfg) == 2
    assert meta["lineage"]["increments"][-1]["mode"] == "incremental"
    meta = append_index(
        lambda: ray.data.from_arrow(c), idx, cfg, auto_compact_epochs=2
    )
    # 3 epochs > 2: hook compacted; returned manifest is the compacted one
    assert index_epochs(idx, cfg) == 1
    assert meta["lineage"].get("bounds_exact", True) is True
    # full-corpus results equal a fresh union build
    union = generate_pages(600, seed=92, vocab_size=400, dup_frac=0.0)
    fresh = str(tmp_path / "fresh")
    build_index(lambda: ray.data.from_arrow(union), fresh, cfg)
    pd.testing.assert_frame_equal(_topk(idx, cfg), _topk(fresh, cfg))
