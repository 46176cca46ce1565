"""Corpus statistics — the "codebook" of the fulltext engine.

Reference analog: the trained coarse quantizer ``centers_`` persisted as
``cq_centers.fvecs`` (quantizer.cpp:108-131) and loaded once before
Populate/Query.  Ours: global N, avgdl, per-term df, and the term ->
partition map (with salt counts for head terms), persisted as a Parquet
sidecar + JSON, broadcast to workers via ``ray.put`` at build/query time.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.hashing import salted_partition, term_partition


@dataclass
class CorpusStats:
    n_docs: int
    total_tokens: int
    max_doc_id: int = 0  # meaningful only for dense external ids
    df: dict[str, int] = field(default_factory=dict)
    cf: dict[str, int] = field(default_factory=dict)  # collection term freq
    salted: dict[str, int] | None = None
    """The PERSISTED salt plan {term: nsalt} the index was built with
    (single-tokenize build: the plan is sample-estimated before exact
    dfs exist, so locations cannot be re-derived from df at query time
    — they must replay the recorded plan).  None = legacy index /
    in-memory stats: derive the plan from exact df (round-1 behavior)."""

    @property
    def avgdl(self) -> float:
        return self.total_tokens / self.n_docs if self.n_docs else 0.0

    # --- partition planning (replaces k-means training, SURVEY T3/T4) ---

    def salt_counts(self, cfg: PipelineConfig) -> dict[str, int]:
        """Hot terms -> number of doc_id-range sub-lists (>1)."""
        if self.salted is not None:
            return dict(self.salted)
        return {
            t: cfg.salts_for_df(d)
            for t, d in self.df.items()
            if d > cfg.hot_df_threshold
        }

    def term_locations(self, term: str, cfg: PipelineConfig) -> list[int]:
        """Ordered partition ids holding this term's postings, in doc_id
        range order (salt order).  Length 1 for normal terms."""
        if self.salted is not None:
            nsalt = self.salted.get(term, 1)
        else:
            nsalt = cfg.salts_for_df(self.df.get(term, 0))
        if nsalt <= 1:
            return [term_partition(term, cfg.num_partitions)]
        return [salted_partition(term, s, cfg.num_partitions) for s in range(nsalt)]

    # --- persistence ----------------------------------------------------

    def save(self, index_dir: str) -> None:
        os.makedirs(index_dir, exist_ok=True)
        terms = sorted(self.df)
        tbl = pa.table(
            {
                "term": pa.array(terms, type=pa.string()),
                "df": pa.array([self.df[t] for t in terms], type=pa.int64()),
                "cf": pa.array([self.cf.get(t, 0) for t in terms], type=pa.int64()),
            }
        )
        tmp = os.path.join(index_dir, "_stats.parquet.tmp")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(index_dir, "stats.parquet"))
        meta = {
            "n_docs": self.n_docs,
            "total_tokens": self.total_tokens,
            "max_doc_id": self.max_doc_id,
        }
        if self.salted is not None:
            meta["salted"] = self.salted
        tmp = os.path.join(index_dir, "_stats.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(index_dir, "stats.json"))

    @classmethod
    def load(cls, index_dir: str) -> "CorpusStats":
        with open(os.path.join(index_dir, "stats.json")) as f:
            meta = json.load(f)
        tbl = pq.read_table(os.path.join(index_dir, "stats.parquet"))
        terms = tbl["term"].to_pylist()
        dfs = tbl["df"].to_numpy()
        cfs = tbl["cf"].to_numpy()
        salted = meta.get("salted")
        return cls(
            n_docs=meta["n_docs"],
            total_tokens=meta["total_tokens"],
            max_doc_id=meta.get("max_doc_id", 0),
            df=dict(zip(terms, (int(x) for x in dfs))),
            cf=dict(zip(terms, (int(x) for x in cfs))),
            salted={t: int(n) for t, n in salted.items()} if salted is not None else None,
        )

    @classmethod
    def exists(cls, index_dir: str) -> bool:
        return os.path.exists(os.path.join(index_dir, "stats.json")) and os.path.exists(
            os.path.join(index_dir, "stats.parquet")
        )
