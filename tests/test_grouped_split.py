"""Leakage-safe grouped split: group-atomicity + blocking independence."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from mini_ivf_ray.pipelines.sampling import grouped_split


def _docs(n=300, groups=17):
    return pa.table(
        {
            "doc_id": pa.array(list(range(n)), type=pa.int64()),
            "domain": [f"site{i % groups}.example" for i in range(n)],
        }
    )


def test_grouped_split_atomic_and_stable():
    t = _docs()
    one = (
        grouped_split(ray.data.from_arrow(t), key_col="domain")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # every group lands in exactly one split, whatever the blocking
    assert (one.groupby("domain")["split"].nunique() == 1).all()
    many = (
        grouped_split(ray.data.from_arrow(t).repartition(7), key_col="domain")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many)
    # bucket is a pure function of the key: same domain -> same bucket
    b = one.groupby("domain")["bucket"].nunique()
    assert (b == 1).all()
    # permille rule honored
    assert set(one["split"]) <= {"train", "val", "test"}
    assert ((one["bucket"] >= 0) & (one["bucket"] < 1000)).all()
    tr = one[one["split"] == "train"]["bucket"]
    assert (tr < 980).all()
