"""Index disk-usage analysis — the Elasticsearch ``_disk_usage`` API
analog: where do the index's bytes actually live, per component and
per TERM.

Per-component totals are file-system stats (one walk).  Per-term
attribution is EXACT, not estimated: the segment layout stores each
term-block's encoded postings as a binary ``payload`` row, so a
term's ENCODED posting bytes are the sum of its payload lengths —
computed in ONE streamed pass over the segment files (payload lengths
via the vectorized ``binary_length`` kernel; the payload bytes
themselves are never decoded), with per-block partial sums merged by
a combiner-first groupby.  The driver receives (vocabulary)-sized
rows cut to top-N.

Semantics note (pinned by the tests): ``payload_bytes`` is the
CODEC-OUTPUT size — what query-time decode actually reads and what
the term costs in the decoded cache — not the post-parquet-compression
footprint, which parquet's page compression can shrink BELOW the
payload sum (file bytes are the component totals' job).  ES's
_disk_usage has the same two-layer split between field data size and
store size.

Not SQL-replayable by design (byte counts are codec facts, not corpus
facts) — served as a rows-only entry whose in-query self-checks pin
the accounting to the dictionary's df/cf bookkeeping and to the
file-system totals.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig

COMPONENTS = (
    ("segments", "segments"),
    ("dictionary", "dictionary.parquet"),
    ("manifest", "manifest.json"),
    ("prepared", "prepared"),
    ("positions", "positions"),
    ("tombstones", "tombstones.parquet"),
)


def component_bytes(index_dir: str) -> dict[str, int]:
    out = {}
    for name, rel in COMPONENTS:
        path = os.path.join(index_dir, rel)
        if os.path.isfile(path):
            out[name] = os.path.getsize(path)
        elif os.path.isdir(path):
            total = 0
            for base, _, files in os.walk(path):
                for f in files:
                    total += os.path.getsize(os.path.join(base, f))
            out[name] = total
        else:
            out[name] = 0
    return out


def term_disk_usage(
    index_dir: str,
    cfg: PipelineConfig | None = None,
    top_n: int = 20,
):
    """Top-N terms by exact on-disk payload bytes:
    (term, payload_bytes, n_blocks, n_postings), ordered
    (payload_bytes desc, term asc)."""
    import glob

    import ray.data
    from ray.data.aggregate import Sum

    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    files = sorted(
        glob.glob(os.path.join(index_dir, "segments", "part=*", "*.parquet"))
    )
    if not files:
        raise FileNotFoundError(f"no segment files under {index_dir}")

    def partial(batch: pa.Table) -> pa.Table:
        sizes = (
            pa.compute.binary_length(batch["payload"])
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        terms = batch["term"].to_pylist()
        counts = batch["count"].to_numpy().astype(np.int64)
        # per-batch partial groupby (a term's blocks may span batches)
        import pandas as pd

        g = (
            pd.DataFrame(
                {"term": terms, "b": sizes, "k": 1, "p": counts}
            )
            .groupby("term", sort=False)
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "term": pa.array(g["term"], type=pa.string()),
                "b": pa.array(g["b"].to_numpy(), type=pa.int64()),
                "k": pa.array(g["k"].to_numpy(), type=pa.int64()),
                "p": pa.array(g["p"].to_numpy(), type=pa.int64()),
            }
        )

    merged = (
        ray.data.read_parquet(files, columns=["term", "count", "payload"])
        .map_batches(partial, batch_format="pyarrow", batch_size=2048)
        .groupby("term")
        .aggregate(
            Sum("b", alias_name="payload_bytes"),
            Sum("k", alias_name="n_blocks"),
            Sum("p", alias_name="n_postings"),
        )
        .to_pandas()
    )
    merged = merged.sort_values(
        ["payload_bytes", "term"], ascending=[False, True]
    ).head(top_n)
    return pa.table(
        {
            "term": pa.array(merged["term"], type=pa.string()),
            "payload_bytes": pa.array(
                merged["payload_bytes"].to_numpy(dtype=np.int64),
                type=pa.int64(),
            ),
            "n_blocks": pa.array(
                merged["n_blocks"].to_numpy(dtype=np.int64), type=pa.int64()
            ),
            "n_postings": pa.array(
                merged["n_postings"].to_numpy(dtype=np.int64),
                type=pa.int64(),
            ),
        }
    )
