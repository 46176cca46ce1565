"""Empty- and 1-row-block hardening (r3 VERDICT #7).

Ray Data freely hands UDFs empty or tiny blocks (after filters,
repartitions, or a driver that reads 8-row blocks), and
``pa.array([])`` infers type ``null`` — one unpinned column and a
downstream ``concat_tables`` dies on schema mismatch (exactly r3's red
``docs_diff`` row).  Every batch UDF must therefore be schema-STABLE:
``fn(empty)`` and ``fn(one_row)`` must produce the same schema as a
populated batch, and the three outputs must concat.
"""

import numpy as np
import pyarrow as pa
import pytest

from mini_ivf_ray.pipelines.analysis import (
    fingerprint_batch,
    langid_batch,
    quality_batch,
    repetition_batch,
)
from mini_ivf_ray.pipelines.dedup import (
    _band_rows,
    _sim_chunk_rows,
    _text_hash_batch,
    simhash_batch,
)
from mini_ivf_ray.pipelines.sketches import _hll_term_batch, _mg_batch
from mini_ivf_ray.pipelines.spans import _gram_rows
from mini_ivf_ray.pipelines.web import _canon_batch
from mini_ivf_ray.stages.prepare import extract_batch
from mini_ivf_ray.stages.spimi import tokenize_postings_batch

DOCS = pa.table(
    {
        "doc_id": pa.array([1, 2, 24], type=pa.int64()),
        "text": pa.array(
            ["the quick brown fox jumps", "lazy dog sleeps all day", "x"],
            type=pa.string(),
        ),
        "lang": pa.array(["en", "en", "de"], type=pa.string()),
        "source": pa.array(["src0", "src1", "src0"], type=pa.string()),
        "url": pa.array(
            ["http://a.example/x", "http://b.example/y?q=1", "http://c.example/"],
            type=pa.string(),
        ),
    }
)

PAGES = pa.table(
    {
        "url": pa.array(["http://a.example/x", "http://b.example/y"], type=pa.string()),
        "warc_ts": pa.array([1, 2], type=pa.int64()),
        "html": pa.array(
            [b"<html><body>hello world</body></html>"] * 2, type=pa.binary()
        ),
    }
)

SIGS = pa.table(
    {
        "doc_id": pa.array([1, 2], type=pa.int64()),
        # the real minhash_signatures schema: fixed_size_list<uint64>[k]
        "sig": pa.array(
            [list(range(64)), list(range(1, 65))],
            type=pa.list_(pa.uint64(), 64),
        ),
    }
)


CASES = [
    ("tokenize_postings", tokenize_postings_batch, DOCS.select(["doc_id", "text"])),
    ("extract", extract_batch, PAGES),
    ("langid", langid_batch, DOCS.select(["doc_id", "text"])),
    ("quality", quality_batch, DOCS.select(["doc_id", "text"])),
    ("repetition", repetition_batch, DOCS.select(["doc_id", "text"])),
    ("fingerprint", fingerprint_batch, DOCS.select(["doc_id", "text"])),
    ("text_hash", _text_hash_batch, DOCS.select(["doc_id", "text", "url"])),
    ("simhash", simhash_batch, DOCS.select(["doc_id", "text"])),
    ("sim_chunks", _sim_chunk_rows, pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "simhash": pa.array([3, 5], type=pa.uint64()),
    })),
    ("bands", lambda b: _band_rows(b, 16, 4), SIGS),
    ("grams", lambda b: _gram_rows(b, 5, 64), DOCS.select(["doc_id", "text"])),
    ("mg", lambda b: _mg_batch(b, 8), DOCS.select(["doc_id", "text"])),
    ("hll", _hll_term_batch, DOCS.select(["doc_id", "text"])),
    ("urlcanon", _canon_batch, DOCS.select(["doc_id", "url"])),
    ("eval_grades", None, DOCS.select(["doc_id", "text"])),  # fn below
    ("sig_partials", None, DOCS.select(["doc_id", "text"])),  # fn below
]


def _sig_partials_fn(batch):
    from mini_ivf_ray.pipelines.sigterms import _sig_partials

    return _sig_partials(
        [(0, frozenset({"quick", "dog"})), (1, frozenset())]
    )(batch)


def _eval_grades_fn(batch):
    from mini_ivf_ray.pipelines.evaluation import _grade_partials

    return _grade_partials(
        [(0, ["quick", "dog"]), (1, ["zz9999qq"])],
        {0: np.array([1], dtype=np.uint64)},
        10,
    )(batch)


_LATE_FNS = {"eval_grades": _eval_grades_fn, "sig_partials": _sig_partials_fn}
CASES = [(n, _LATE_FNS.get(n, f), s) for n, f, s in CASES]


@pytest.mark.parametrize("name,fn,sample", CASES, ids=[c[0] for c in CASES])
def test_schema_stable_on_empty_and_tiny_blocks(name, fn, sample):
    full = fn(sample)
    one = fn(sample.slice(0, 1))
    empty = fn(sample.slice(0, 0))
    assert empty.schema.equals(full.schema), (
        f"{name}: empty-block schema drifts\n{empty.schema}\nvs\n{full.schema}"
    )
    assert one.schema.equals(full.schema), f"{name}: 1-row-block schema drifts"
    # the concat is the real gate: Ray merges output blocks, and one
    # null-typed column from an empty batch kills the whole pipeline.
    # (Aggregate-style UDFs — mg/hll — legitimately emit a per-batch
    # summary row even for an empty batch, so row counts just add up.)
    merged = pa.concat_tables([empty, one, full])
    assert merged.num_rows == empty.num_rows + one.num_rows + full.num_rows


def test_docs_diff_empty_added_branch(tmp_path, ray_session):
    """r3's red driver row, reproduced as a regression test: a
    documents block with NO doc_id % 23 == 0 rows must not null-type
    the synthetic 'added' columns (the driver feeds 8-row blocks, so
    most blocks hit the empty branch)."""
    import os
    import sys

    import pyarrow.parquet as pq

    sf = tmp_path / "sf"
    os.makedirs(sf)
    # ids avoiding multiples of 23 -> the mutate 'added' table is empty
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 24, 25], type=pa.int64()),
                "lang": pa.array(["en"] * 5, type=pa.string()),
                "n_chars": pa.array([10, 20, 30, 40, 50], type=pa.int64()),
            }
        ),
        str(sf / "documents.parquet"),
    )
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod

    out = entry_mod.queries()["docs_diff"](str(sf))
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    # every key classified; drop doc 23-multiples... none added here
    assert len(df) >= 5
    assert set(df.columns) >= {"doc_id", "status"} or len(df.columns) >= 2
