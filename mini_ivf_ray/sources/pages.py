"""Synthetic Common-Crawl-style pages + readers/adapters.

The input table shape is authoritative (BASELINE.json input_hint):
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``.  Reference analog of the generator: the randomized
self-contained test corpora of test_ivf.cpp:26-61 (uniform random
vectors generated in-test); ours is seeded Zipf text so head-term skew
is present even at small scale (FIXTURES.md §1).

Everything is deterministic given (n_docs, seed).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mini_ivf_ray.functions.extract import wrap_html

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_LANGS = np.array(["en", "de", "es", "fr", "zh"])
_LANG_P = np.array([0.45, 0.15, 0.15, 0.13, 0.12])


def _vocab(size: int) -> np.ndarray:
    # a few real head words (so stopword logic has targets) + synthetic tail
    head = ["the", "a", "of", "to", "and", "in", "data", "web", "page", "time"]
    tail = [f"w{i:05d}" for i in range(len(head), size)]
    return np.asarray(head + tail, dtype=object)


def generate_pages(
    n_docs: int,
    seed: int = 42,
    vocab_size: int = 5000,
    zipf_s: float = 1.07,
    mean_len: int = 60,
    dup_frac: float = 0.02,
) -> pa.Table:
    """One deterministic Arrow table of pages.  ``dup_frac`` of rows are
    url-duplicates with a later warc_ts and different text, exercising
    last-write-wins dedup before docID assignment."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(vocab_size)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = ranks**-zipf_s
    probs /= probs.sum()

    lens = np.maximum(1, rng.lognormal(np.log(mean_len), 0.6, n_docs).astype(np.int64))
    total = int(lens.sum())
    flat = rng.choice(vocab_size, size=total, p=probs)
    offs = np.concatenate([[0], np.cumsum(lens)])

    texts = []
    for i in range(n_docs):
        texts.append(" ".join(vocab[flat[offs[i] : offs[i + 1]]]))

    sites = rng.integers(0, max(1, n_docs // 50), n_docs)
    urls = [f"https://site{s}.example/p/{i}" for i, s in enumerate(sites)]
    base_ts = np.datetime64("2024-03-01T00:00:00", "us")
    ts = base_ts + rng.integers(0, 86_400_000_000 * 30, n_docs).astype("timedelta64[us]")

    # url duplicates: re-crawl of an earlier url with later ts + new text
    n_dup = int(n_docs * dup_frac)
    if n_dup:
        srcs = rng.integers(0, n_docs, n_dup)
        for j, s in enumerate(srcs):
            k = n_docs - n_dup + j
            urls[k] = urls[s]
            ts[k] = ts[s] + np.timedelta64(3_600_000_000, "us")

    langs = rng.choice(_LANGS, size=n_docs, p=_LANG_P)
    htmls = [wrap_html(t, title=u) for t, u in zip(texts, urls)]
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs.tolist(), type=pa.string()),
        }
    )


def write_pages_corpus(
    out_dir: str, n_docs: int, seed: int = 42, num_files: int = 8, **kw
) -> str:
    """Materialize a deterministic corpus as a directory of Parquet
    shards (idempotent: skipped if the completion marker exists).
    Shards are generated independently (seed + shard) so generation
    itself could be distributed."""
    marker = os.path.join(out_dir, f"_DONE_{n_docs}_{seed}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    per = -(-n_docs // num_files)
    start = 0
    for f in range(num_files):
        n = min(per, n_docs - start)
        if n <= 0:
            break
        tbl = generate_pages(n, seed=seed + 1000 * f, **kw)
        # keep urls globally unique across shards (doc index offset)
        urls = [u.replace("/p/", f"/p/{f}x") for u in tbl["url"].to_pylist()]
        tbl = tbl.set_column(0, "url", pa.array(urls, type=pa.string()))
        pq.write_table(tbl, os.path.join(out_dir, f"pages_{f:04d}.parquet"))
        start += n
    with open(marker, "w") as fh:
        fh.write("ok")
    return out_dir


def read_pages(path: str):
    """Pages Dataset from a parquet file/dir — column-pruned to what the
    index build needs (html carried only when text must be re-extracted)."""
    import ray.data

    return ray.data.read_parquet(path)


def documents_as_pages(sf_dir: str, text_transform=None):
    """Adapt the driver's ``documents`` table (doc_id, text, lang, source,
    n_chars) to the pages shape, deriving url from source/doc_id and
    wrapping text in the canonical html (FIXTURES.md §5).

    ``text_transform``: optional ``list[str] -> list[str]`` applied to
    each batch's texts before wrapping (e.g. the BM25F field-boost
    replication, functions/fields.py)."""
    import ray.data

    def to_pages(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        if text_transform is not None:
            texts = text_transform(texts)
        ids = batch["doc_id"].to_numpy()
        srcs = batch["source"].to_pylist()
        urls = [f"https://{s}.example/{i}" for s, i in zip(srcs, ids)]
        ts = pa.array(
            np.full(len(urls), np.datetime64("2024-01-01T00:00:00", "us")),
        )
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": ts,
                "html": pa.array([wrap_html(t, u) for t, u in zip(texts, urls)], type=pa.binary()),
                "text": (
                    pa.array(texts, type=pa.string())
                    if text_transform is not None
                    else batch["text"]
                ),
                "lang": batch["lang"],
                "doc_id": batch["doc_id"],  # kept: oracle-friendly stable id
            }
        )

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    return ds.map_batches(to_pages, batch_format="pyarrow", batch_size=1024)
