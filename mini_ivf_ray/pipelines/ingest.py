"""Ingest pipelines — Elasticsearch's ingest-node processor chains
(`PUT _ingest/pipeline` + `_simulate`): an ORDERED list of document
processors applied at index time, each reading the output of the one
before it.

Supported processors (each the ES processor of the same name, each a
vectorized Arrow kernel, each SQL-replayable so a pipeline's output
hashes against a nested-expression oracle):

  {"op": "lowercase", "field": f}            pc.utf8_lower
  {"op": "uppercase", "field": f}            pc.utf8_upper
  {"op": "trim", "field": f}                 pc.utf8_trim_whitespace
  {"op": "gsub", "field": f,
   "pattern": p, "replacement": r}           RE2 replace-all — the
                                             scrub/pii precedent:
                                             pyarrow and DuckDB both
                                             run RE2-class regexes
  {"op": "set", "field": f, "value": v}      constant column
  {"op": "copy", "from": a, "to": b}         ES set with copy_from
  {"op": "fingerprint", "fields": [...],
   "target": f}                              md5 hex of the
                                             '|'-joined fields (ES
                                             fingerprint processor's
                                             concat-then-hash shape)
  {"op": "remove", "field": f}               drop the column

Chain semantics pinned: processors apply IN ORDER over the running
schema — a gsub after a lowercase sees lowercased text, a fingerprint
after a gsub hashes the substituted value (the pytest pins an
order-sensitivity witness).  Referencing a missing field raises at
validation time against the input schema threaded through the chain
(ES's on_failure error surface, strict variant); ``set`` / ``copy`` /
``fingerprint`` add fields downstream processors may use.

Deployment: the validated chain is applied by ONE stateless
``map_batches`` pass — processors never see row Python objects, and
the pipeline composes with every downstream stage (it IS the pages
source shape).  At 100 TB this is the classic pre-index ETL map; no
shuffle, no state.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_STRING_OPS = {"lowercase", "uppercase", "trim", "gsub"}


def validate_pipeline(
    processors: list[dict], input_columns: list[str]
) -> list[str]:
    """Validate the chain against the input schema; returns the
    OUTPUT column list (order preserved, additions appended)."""
    cols = list(input_columns)
    for i, p in enumerate(processors):
        op = p.get("op")
        if op in _STRING_OPS:
            f = p.get("field")
            if f not in cols:
                raise ValueError(
                    f"processor {i} ({op}): unknown field {f!r}"
                )
            if op == "gsub" and (
                "pattern" not in p or "replacement" not in p
            ):
                raise ValueError(f"processor {i}: gsub needs pattern/replacement")
        elif op == "set":
            f = p.get("field")
            if not f:
                raise ValueError(f"processor {i}: set needs field")
            if f not in cols:
                cols.append(f)
        elif op == "copy":
            if p.get("from") not in cols:
                raise ValueError(
                    f"processor {i} (copy): unknown field {p.get('from')!r}"
                )
            if p.get("to") not in cols:
                cols.append(p["to"])
        elif op == "fingerprint":
            missing = [f for f in p.get("fields", []) if f not in cols]
            if missing or not p.get("fields"):
                raise ValueError(
                    f"processor {i} (fingerprint): bad fields {missing}"
                )
            if p.get("target") not in cols:
                cols.append(p["target"])
        elif op == "remove":
            if p.get("field") not in cols:
                raise ValueError(
                    f"processor {i} (remove): unknown field {p.get('field')!r}"
                )
            cols.remove(p["field"])
        else:
            raise ValueError(f"processor {i}: unknown op {op!r}")
    return cols


def _apply_one(batch: pa.Table, p: dict) -> pa.Table:
    op = p["op"]
    if op in _STRING_OPS:
        f = p["field"]
        col = batch[f]
        if op == "lowercase":
            out = pc.utf8_lower(col)
        elif op == "uppercase":
            out = pc.utf8_upper(col)
        elif op == "trim":
            out = pc.utf8_trim_whitespace(col)
        else:
            out = pc.replace_substring_regex(
                col, pattern=p["pattern"], replacement=p["replacement"]
            )
        return batch.set_column(
            batch.column_names.index(f), f, out
        )
    if op == "set":
        val = pa.array([p["value"]] * batch.num_rows)
        if p["field"] in batch.column_names:
            return batch.set_column(
                batch.column_names.index(p["field"]), p["field"], val
            )
        return batch.append_column(p["field"], val)
    if op == "copy":
        col = batch[p["from"]]
        if p["to"] in batch.column_names:
            return batch.set_column(
                batch.column_names.index(p["to"]), p["to"], col
            )
        return batch.append_column(p["to"], col)
    if op == "fingerprint":
        parts = [
            batch[f].to_numpy(zero_copy_only=False).astype(str)
            for f in p["fields"]
        ]
        joined = parts[0]
        for q in parts[1:]:
            joined = np.char.add(np.char.add(joined, "|"), q)
        fp = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in joined]
        col = pa.array(fp, type=pa.string())
        if p["target"] in batch.column_names:
            return batch.set_column(
                batch.column_names.index(p["target"]), p["target"], col
            )
        return batch.append_column(p["target"], col)
    if op == "remove":
        return batch.drop_columns([p["field"]])
    raise ValueError(f"unknown op {op!r}")  # pragma: no cover


def run_pipeline(docs_ds, processors: list[dict]):
    """Apply the validated processor chain with ONE map_batches pass;
    returns the transformed Dataset."""
    validate_pipeline(processors, docs_ds.schema().names)
    chain = list(processors)

    def apply(batch: pa.Table) -> pa.Table:
        for p in chain:
            batch = _apply_one(batch, p)
        return batch

    return docs_ds.map_batches(apply, batch_format="pyarrow")
