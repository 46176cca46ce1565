"""Resumable partitioned sink (sources/sink.py)."""

import os

import numpy as np
import pandas as pd
import pytest

import ray.data
from mini_ivf_ray.sources.sink import (
    committed_parts,
    read_partitioned,
    write_partitioned,
)


def _table(n=2000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": rng.choice(["en", "de", "fr", "zh"], n),
            "score": rng.normal(size=n),
        }
    )


def test_roundtrip_and_layout(tmp_path):
    df = _table()
    path = str(tmp_path / "sink")
    written = write_partitioned(
        ray.data.from_pandas(df), path, key="doc_id", num_partitions=8
    )
    assert written == set(range(8))
    assert committed_parts(path, 8) == set(range(8))
    # one directory per partition, never one giant file
    assert sorted(os.listdir(path)) == [f"part={p}" for p in range(8)]
    back = read_partitioned(path).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(
        back.reset_index(drop=True),
        df.sort_values("doc_id").reset_index(drop=True),
        check_like=True,
    )


def test_resume_skips_committed_partitions(tmp_path):
    df = _table()
    path = str(tmp_path / "sink")
    write_partitioned(ray.data.from_pandas(df), path, key="doc_id", num_partitions=6)
    mtimes = {
        p: os.path.getmtime(os.path.join(path, f"part={p}", "data.parquet"))
        for p in range(6)
    }
    # simulate a crash: two partitions lose their commit markers
    for p in (1, 4):
        os.remove(os.path.join(path, f"part={p}", "_SUCCESS.json"))
    with pytest.raises(ValueError, match="uncommitted"):
        read_partitioned(path, num_partitions=6)
    written = write_partitioned(
        ray.data.from_pandas(df), path, key="doc_id", num_partitions=6
    )
    assert written == {1, 4}
    # committed partitions untouched (byte/mtime identity)
    for p in (0, 2, 3, 5):
        assert (
            os.path.getmtime(os.path.join(path, f"part={p}", "data.parquet"))
            == mtimes[p]
        )
    back = read_partitioned(path).to_pandas()
    assert len(back) == len(df)
    # idempotent: a third run writes nothing
    assert (
        write_partitioned(
            ray.data.from_pandas(df), path, key="doc_id", num_partitions=6
        )
        == set()
    )


def test_string_keys_and_empty_partitions(tmp_path):
    df = _table(300)
    path = str(tmp_path / "sink_s")
    # way more partitions than distinct string keys -> hash gaps get
    # zero-row markers so resume can distinguish done-empty from
    # not-attempted
    written = write_partitioned(
        ray.data.from_pandas(df), path, key="lang", num_partitions=16
    )
    assert written == set(range(16))
    back = read_partitioned(path, num_partitions=16).to_pandas()
    assert len(back) == len(df)
    # co-location: each partition holds whole languages
    for p in range(16):
        f = os.path.join(path, f"part={p}", "data.parquet")
        if os.path.exists(f):
            import pyarrow.parquet as pq

            langs = set(pq.read_table(f)["lang"].to_pylist())
            all_rows = df[df["lang"].isin(langs)]
            assert len(pq.read_table(f)) == len(all_rows)
