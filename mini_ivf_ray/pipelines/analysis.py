"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline staples (task brief): language-ID
(marker heuristic), quality scoring, token counting, document
fingerprinting.  No reference analog (mini-ivf is vector-only); these
are first-class additions.  All are stateless vectorized
``map_batches`` stages; every rule is deliberately SQL-expressible so
the driver's DuckDB oracle can replay it exactly (see
``__ray_entry__.oracle_sql``).

Float columns are rounded to 6 decimals on BOTH sides — Python and
DuckDB compute the same float64 expressions; rounding removes any
last-ulp ambiguity from differing evaluation order.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.functions.tokenize import tokenize, tokenize_batch

# ---- language-ID marker profiles (iteration order = preference order) ----
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "los", "de", "que", "es"),
    "fr": ("le", "la", "les", "et", "est", "que"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in")

_PUNCT_RE = re.compile(r"[a-zA-Z0-9 \t\n]")


def detect_lang(tokens: list[str]) -> str:
    """First language (in LANG_MARKERS order) with the maximal marker
    occurrence count; 'und' when no marker occurs.  Deterministic and
    replayable as a SQL CASE chain."""
    counts = {
        lang: sum(1 for t in tokens if t in marks)
        for lang, marks in LANG_MARKERS.items()
    }
    m = max(counts.values()) if counts else 0
    if m == 0:
        return "und"
    for lang in LANG_MARKERS:
        if counts[lang] == m:
            return lang
    return "und"


def langid_batch(batch: pa.Table) -> pa.Table:
    toks = [tokenize(t) for t in batch["text"].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "detected_lang": pa.array([detect_lang(ts) for ts in toks], type=pa.string()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    toks = [tokenize(t) for t in texts]
    n_tokens = np.array([len(ts) for ts in toks], dtype=np.int64)
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    stop = np.array(
        [sum(1 for x in ts if x in STOPWORDS) for ts in toks], dtype=np.int64
    )
    tok_chars = np.array([sum(len(x) for x in ts) for ts in toks], dtype=np.int64)
    n_punct = np.array(
        [len(_PUNCT_RE.sub("", t)) for t in texts], dtype=np.int64
    )
    safe = np.maximum(n_tokens, 1).astype(np.float64)
    safe_c = np.maximum(n_chars, 1).astype(np.float64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens),
            "n_chars": pa.array(n_chars),
            "stop_ratio": pa.array(np.round(stop / safe, 6), type=pa.float64()),
            "mean_token_len": pa.array(np.round(tok_chars / safe, 6), type=pa.float64()),
            "punct_ratio": pa.array(np.round(n_punct / safe_c, 6), type=pa.float64()),
        }
    )


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style within-document repetition signals (Rae et al.
    2021, public filter recipe): fraction of n-gram instances that are
    repeats of an earlier n-gram, and the most-frequent-token mass.
    Heavy repetition is the classic boilerplate/spam signature a
    web-corpus cleaning pipeline thresholds on.

    Vectorized: one batch-level factorize, n-gram keys as integer
    mixes, per-doc distinct/total via ONE pandas hash groupby across
    the whole batch (no per-doc Python loops).  Fractions are single
    raw float64 divisions so DuckDB list-op oracles match
    bit-for-bit."""
    texts = batch["text"].to_pylist()
    toks, dls = tokenize_batch(texts)
    n_docs = len(texts)
    n_tokens = dls.astype(np.int64)
    flat = [t for ts in toks for t in ts]
    doc_idx = np.repeat(np.arange(n_docs), n_tokens)
    out = {
        "dup_2gram_frac": np.zeros(n_docs, dtype=np.float64),
        "dup_3gram_frac": np.zeros(n_docs, dtype=np.float64),
        "top_token_frac": np.zeros(n_docs, dtype=np.float64),
    }
    if flat:
        codes, _ = pd.factorize(np.asarray(flat, dtype=object))
        codes = codes.astype(np.int64)
        # top-token mass: max per-(doc, token) count / doc length
        df = pd.DataFrame({"d": doc_idx, "t": codes})
        cnt = df.groupby(["d", "t"], sort=False).size()
        top = cnt.groupby(level=0).max()
        out["top_token_frac"][top.index.to_numpy()] = top.to_numpy() / n_tokens[
            top.index.to_numpy()
        ]
        for n, col in ((2, "dup_2gram_frac"), (3, "dup_3gram_frac")):
            # n-gram key: exact base-V positional mix of token codes,
            # valid only where the whole window stays inside one doc
            if len(codes) < n:
                continue
            valid = doc_idx[: len(codes) - n + 1] == doc_idx[n - 1 :]
            if not valid.any():
                continue
            v = int(codes.max()) + 1
            # base-V positional mix stays exact in int64 while
            # v**n < 2**63; beyond that fall back to Python ints
            L = len(codes) - n + 1
            dt = np.int64 if v ** n < 2 ** 63 else object
            key = codes[:L].astype(dt)
            for j in range(1, n):
                key = key * v + codes[j : L + j]
            g = pd.DataFrame(
                {"d": doc_idx[: len(codes) - n + 1][valid], "k": key[valid]}
            )
            per_doc = g.groupby("d", sort=False)["k"].agg(["size", "nunique"])
            d_ix = per_doc.index.to_numpy()
            total = per_doc["size"].to_numpy().astype(np.float64)
            distinct = per_doc["nunique"].to_numpy().astype(np.float64)
            out[col][d_ix] = (total - distinct) / total
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens),
            "dup_2gram_frac": pa.array(out["dup_2gram_frac"], type=pa.float64()),
            "dup_3gram_frac": pa.array(out["dup_3gram_frac"], type=pa.float64()),
            "top_token_frac": pa.array(out["top_token_frac"], type=pa.float64()),
        }
    )


def repetition(docs_ds, batch_size: int = 1024):
    return docs_ds.map_batches(
        repetition_batch, batch_format="pyarrow", batch_size=batch_size
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Canonical document fingerprint: md5 of the space-joined token
    stream (normalization-stable: case/punct-insensitive)."""
    fps = [
        hashlib.md5(" ".join(tokenize(t)).encode("utf-8")).hexdigest()
        for t in batch["text"].to_pylist()
    ]
    return pa.table(
        {"doc_id": batch["doc_id"], "fingerprint": pa.array(fps, type=pa.string())}
    )


def quality_filter(
    docs_ds,
    min_tokens: int = 10,
    max_stop_ratio: float = 0.5,
    max_punct_ratio: float = 0.2,
    batch_size: int = 1024,
):
    """The canonical training-data pipeline step: score -> threshold ->
    keep (doc_id plus the scores that justified keeping it).  Stateless,
    vectorized, streams; compose with ``.write_parquet`` for the
    filtered-corpus materialization."""

    def fn(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        keep = (
            (q["n_tokens"].to_numpy() >= min_tokens)
            & (q["stop_ratio"].to_numpy() <= max_stop_ratio)
            & (q["punct_ratio"].to_numpy() <= max_punct_ratio)
        )
        return q.filter(pa.array(keep))

    return docs_ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def langid(docs_ds, batch_size: int = 1024):
    return docs_ds.map_batches(langid_batch, batch_format="pyarrow", batch_size=batch_size)


def quality(docs_ds, batch_size: int = 1024):
    return docs_ds.map_batches(quality_batch, batch_format="pyarrow", batch_size=batch_size)


def fingerprints(docs_ds, batch_size: int = 1024):
    return docs_ds.map_batches(
        fingerprint_batch, batch_format="pyarrow", batch_size=batch_size
    )


def clean_corpus(
    docs_ds,
    min_tokens: int = 20,
    max_stop_ratio: float = 0.3,
    max_punct_ratio: float = 0.05,
    out_dir: str | None = None,
    num_buckets: int = 64,
):
    """The composed training-data cleaning pipeline: quality filter ->
    exact text dedup (keep min doc_id) -> optional partitioned survivor
    manifest -> per-language kept counts.

    Shuffle shape: survivors shrink to (doc_id, lang, text-hash) rows
    before the ONE dedup exchange (hash-bucketed, never O(N) groups);
    counts pre-aggregate per bucket so the final lang groupby is tiny.
    ``out_dir`` writes the survivor manifest as lang-partitioned parquet
    (one directory per language — the resumable-output layout; the full
    cleaned TEXT materialization would add a bucketed join of winners
    back to the corpus, same pattern as relational.bucketed_hash_join).
    Returns (lang, n_kept) pyarrow table."""
    import hashlib as _hl

    import ray

    def prep(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        keep = (
            (q["n_tokens"].to_numpy() >= min_tokens)
            & (q["stop_ratio"].to_numpy() <= max_stop_ratio)
            & (q["punct_ratio"].to_numpy() <= max_punct_ratio)
        )
        hs = [
            _hl.md5(t.encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        tbl = pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "h": pa.array(hs, type=pa.string()),
            }
        ).filter(pa.array(keep))
        b = np.array(
            [int(h[:8], 16) % num_buckets for h in tbl["h"].to_pylist()],
            dtype=np.int64,
        )
        return tbl.append_column("bucket", pa.array(b))

    def winners(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["h", "doc_id"], kind="mergesort")
        first = np.ones(len(g), dtype=bool)
        hs = g["h"].to_numpy()
        first[1:] = hs[1:] != hs[:-1]
        return g[first][["doc_id", "lang"]]

    ds = (
        docs_ds.map_batches(prep, batch_format="pyarrow", batch_size=1024)
        .groupby("bucket")
        .map_groups(winners, batch_format="pandas")
    )
    if out_dir is not None:
        ds = ds.materialize()
        try:
            ds.write_parquet(out_dir, partition_cols=["lang"])
        except TypeError:  # older Ray without partition_cols
            ds.write_parquet(out_dir)
    counts = (
        ds.groupby("lang").count().to_pandas().rename(columns={"count()": "n_kept"})
    )
    counts = counts.sort_values("lang").reset_index(drop=True)
    return pa.table(
        {
            "lang": pa.array(counts["lang"], type=pa.string()),
            "n_kept": pa.array(counts["n_kept"].to_numpy().astype(np.int64)),
        }
    )


def grouped_dl_quantiles(docs_ds, qs=(0.5, 0.9, 0.99)):
    """EXACT per-language doc-length quantiles from a distributed
    histogram: per-batch (lang, dl) counts -> one small groupby (the
    histogram is languages x distinct lengths, never O(docs)) -> the
    driver reads each quantile off the cumulative counts with DuckDB's
    quantile_disc rule (value at rank ceil(q*n)).  Returns
    (lang, n_docs, q50, q90, q99)."""
    from ray.data.aggregate import Sum

    from mini_ivf_ray.functions.tokenize import tokenize_batch

    def partials(batch: pa.Table) -> pa.Table:
        _, dls = tokenize_batch(batch["text"].to_pylist())
        df = pd.DataFrame({"lang": batch["lang"].to_pylist(), "dl": dls, "n": 1})
        g = df.groupby(["lang", "dl"], sort=False)["n"].sum().reset_index()
        return pa.table(
            {
                "lang": pa.array(g["lang"], type=pa.string()),
                "dl": pa.array(g["dl"].to_numpy().astype(np.int64)),
                "n": pa.array(g["n"].to_numpy().astype(np.int64)),
            }
        )

    hist = (
        docs_ds.map_batches(partials, batch_format="pyarrow", batch_size=1024)
        .groupby(["lang", "dl"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["lang", "dl"], kind="mergesort")
    )
    rows = {"lang": [], "n_docs": []}
    for q in qs:
        rows[f"q{int(q * 100)}"] = []
    for lang, g in hist.groupby("lang", sort=True):
        cum = g["n"].to_numpy().cumsum()
        total = int(cum[-1])
        rows["lang"].append(lang)
        rows["n_docs"].append(total)
        for q in qs:
            rank = int(np.ceil(q * total))
            idx = int(np.searchsorted(cum, max(1, rank)))
            rows[f"q{int(q * 100)}"].append(int(g["dl"].to_numpy()[idx]))
    return pa.table(
        {
            "lang": pa.array(rows["lang"], type=pa.string()),
            "n_docs": pa.array(np.asarray(rows["n_docs"], dtype=np.int64)),
            **{
                f"q{int(q * 100)}": pa.array(
                    np.asarray(rows[f"q{int(q * 100)}"], dtype=np.int64)
                )
                for q in qs
            },
        }
    )


# ---------------------------------------------------------------------------
# Denylist term scrub (C4-style "bad words" pass)
# ---------------------------------------------------------------------------


def scrub_terms(docs_ds, terms, repl: str = "[REDACTED]"):
    """Replace whole-word occurrences of a denylist (profanity / PII
    tokens in a real pipeline) and report the per-doc redaction count —
    the C4 bad-words pass as a stateless vectorized map.

    Both this engine (pyarrow string kernels) and the DuckDB oracle run
    RE2, so ``\\b(t1|t2|...)\\b`` substitution and counting match
    byte-for-byte.  Zero shuffle, zero state; the pattern compiles once
    per call site and ships in the task closure.
    """
    import pyarrow.compute as pc

    pat = r"\b(" + "|".join(sorted(terms)) + r")\b"

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clean_text": pc.replace_substring_regex(
                    batch["text"], pat, repl
                ),
                "n_redacted": pc.cast(
                    pc.count_substring_regex(batch["text"], pat), pa.int64()
                ),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PII redaction (email / phone / IPv4)
# ---------------------------------------------------------------------------

# RE2-safe patterns (no lookaround/backrefs): identical semantics in the
# pyarrow compute kernels and the DuckDB oracle, both RE2-backed.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "[PHONE]"),
]


def redact_pii(docs_ds, text_col: str = "text"):
    """Replace emails, IPv4 addresses and phone numbers with typed
    placeholders; report per-doc counts per category.  Stateless
    vectorized map (three RE2 passes, applied in the fixed PII_PATTERNS
    order so the email pass cannot eat phone digits and vice versa);
    zero shuffle."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        counts = {}
        for name, pat, repl in PII_PATTERNS:
            counts[name] = pc.cast(pc.count_substring_regex(col, pat), pa.int64())
            col = pc.replace_substring_regex(col, pat, repl)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clean_text": col,
                "n_emails": counts["email"],
                "n_ips": counts["ipv4"],
                "n_phones": counts["phone"],
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def compression_signals(docs_ds, level: int = 6, batch_size: int = 1024):
    """Per-document zlib compression ratio — the Gopher-family quality
    signal (highly repetitive / boilerplate text compresses far below
    natural prose; Rae et al. 2021 use it as a repetition filter).
    Deterministic (fixed zlib level, stdlib), stateless per-batch map,
    zero shuffle.  Output: (doc_id, n_bytes, n_gz_bytes, gz_ratio) with
    gz_ratio = n_gz_bytes / n_bytes raw float64 (0-byte docs report
    ratio 0.0)."""
    import zlib

    import numpy as np
    import pyarrow as pa

    def signals(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = np.empty(len(texts), dtype=np.int64)
        gz = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            raw = t.encode("utf-8")
            n[i] = len(raw)
            gz[i] = len(zlib.compress(raw, level))
        ratio = np.divide(
            gz, n, out=np.zeros(len(texts), dtype=np.float64),
            where=n > 0, casting="unsafe",
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(n, type=pa.int64()),
                "n_gz_bytes": pa.array(gz, type=pa.int64()),
                "gz_ratio": pa.array(ratio, type=pa.float64()),
            }
        )

    return docs_ds.map_batches(
        signals, batch_format="pyarrow", batch_size=batch_size
    )


def adaptive_length_filter(docs_ds, q: float = 0.5):
    """Per-group ADAPTIVE threshold filter — the composition pattern a
    corpus-dependent cleaning rule needs: (1) exact per-language
    length quantile from the distributed (lang, dl) histogram
    (grouped_dl_quantiles' rule: value at rank ceil(q*n)), (2) the
    tiny {lang: threshold} map broadcast once, (3) one filter pass
    keeping docs with dl >= their language's threshold.  Two passes
    over the data, zero O(docs) driver state.  Output: (doc_id, lang,
    dl) of the survivors."""
    import ray
    from ray.data.aggregate import Sum

    from mini_ivf_ray.functions.tokenize import tokenize_batch

    def hist_partials(batch: pa.Table) -> pa.Table:
        _, dls = tokenize_batch(batch["text"].to_pylist())
        df = pd.DataFrame({"lang": batch["lang"].to_pylist(), "dl": dls, "n": 1})
        g = df.groupby(["lang", "dl"], sort=False)["n"].sum().reset_index()
        return pa.table(
            {
                "lang": pa.array(g["lang"], type=pa.string()),
                "dl": pa.array(g["dl"].to_numpy().astype(np.int64)),
                "n": pa.array(g["n"].to_numpy().astype(np.int64)),
            }
        )

    hist = (
        docs_ds.map_batches(hist_partials, batch_format="pyarrow", batch_size=1024)
        .groupby(["lang", "dl"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["lang", "dl"], kind="mergesort")
    )
    thr: dict[str, int] = {}
    for lang, g in hist.groupby("lang", sort=True):
        counts = g["n"].to_numpy()
        vals = g["dl"].to_numpy()
        n = int(counts.sum())
        rank = int(np.ceil(q * n))  # quantile_disc rule
        thr[lang] = int(vals[np.searchsorted(np.cumsum(counts), rank)])
    thr_ref = ray.put(thr)

    def keep(batch: pa.Table) -> pa.Table:
        import ray as _ray

        t = _ray.get(thr_ref)
        _, dls = tokenize_batch(batch["text"].to_pylist())
        langs = batch["lang"].to_pylist()
        mask = np.array(
            [dl >= t.get(l, 0) for l, dl in zip(langs, dls)], dtype=bool
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(pa.array(mask)),
                "lang": batch["lang"].filter(pa.array(mask)),
                "dl": pa.array(dls[mask], type=pa.int64()),
            }
        )

    return docs_ds.map_batches(keep, batch_format="pyarrow", batch_size=1024)
