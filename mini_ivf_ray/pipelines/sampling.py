"""Deterministic corpus splitting/sampling.

Training-data pipelines need REPRODUCIBLE splits: the same document
must land in the same train/val/test split on every run, on every
cluster size, regardless of block order — so the assignment must be a
pure function of the row, never of ``random()`` state or row position.
The canonical recipe is a salted content hash bucketed into permille
ranges (the salt versions the split).

md5 (not pandas siphash) is used deliberately: it is the one hash both
this engine and any SQL engine (DuckDB ``md5()``) can compute
bit-identically, so the split is auditable end-to-end — the driver
oracle replays the exact assignment.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def salt_hash60(doc_ids, salt: str) -> np.ndarray:
    """Top 60 bits of md5(f"{id}:{salt}") as int64 — the deterministic
    pseudo-random order key shared by split/sample operators and their
    SQL oracles (== ('0x' || substr(md5(...), 1, 15))::UBIGINT)."""
    md5 = hashlib.md5
    frombytes = int.from_bytes
    return np.fromiter(
        (
            frombytes(md5(f"{int(i)}:{salt}".encode()).digest()[:8], "big") >> 4
            for i in doc_ids
        ),
        dtype=np.int64,
        count=len(doc_ids),
    )


def split_bucket(doc_ids, salt: str) -> np.ndarray:
    """Permille bucket per id: first 60 bits of md5(f"{id}:{salt}") mod
    1000 (== first 15 hex chars as an int — the form a SQL auditor
    replays as ``('0x' || substr(md5(...), 1, 15))::UBIGINT``).  Pure,
    order-independent, salt-versioned."""
    return salt_hash60(doc_ids, salt) % 1000


def stable_split(
    docs_ds,
    salt: str = "v1",
    train_permille: int = 980,
    val_permille: int = 990,
):
    """(doc_id, bucket, split): train if bucket < train_permille, val if
    < val_permille, else test.  Stateless map — no shuffle, no sort, no
    dependence on partitioning; safe to recompute anywhere at 100 TB."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        b = split_bucket(ids, salt)
        split = np.where(
            b < train_permille, "train", np.where(b < val_permille, "val", "test")
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "bucket": pa.array(b, type=pa.int64()),
                "split": pa.array(split.astype(object), type=pa.string()),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Grouped head: exact k-smallest rows per group, combiner-first
# ---------------------------------------------------------------------------


def grouped_head(ds, group_col: str, k: int, order_cols: list[str], num_buckets=None):
    """Exact k rows per group, smallest by ``order_cols`` (which MUST be
    a total order within each group — include a unique tiebreak).

    Scale shape: a per-batch combiner keeps each batch's per-group
    min-k FIRST (any row outside its batch-local top-k cannot be in
    the global top-k), so the one exchange carries at most
    k × groups-per-batch rows per batch — never the corpus.  Survivors
    are co-located by fixed-width group-hash buckets (group-count skew
    spreads across buckets; a single mega-group is already bounded at
    k × batches rows by the combiner) and finalized per bucket.
    """
    import ray

    from mini_ivf_ray.pipelines.relational import _key_hash

    if num_buckets is None:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        num_buckets = max(32, 4 * n_cpus)

    def _head(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, *order_cols], kind="mergesort")
        return df.groupby(group_col, sort=False).head(k)

    def partial(batch: pa.Table) -> pa.Table:
        df = _head(batch.to_pandas())
        df["_gb"] = (
            _key_hash(df[group_col].to_numpy()) % num_buckets
        ).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def finalize(group: pd.DataFrame) -> pd.DataFrame:
        return _head(group).drop(columns=["_gb"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_gb")
        .map_groups(finalize, batch_format="pandas")
    )


def cap_per_group(docs_ds, group_col: str = "source", k: int = 10):
    """Per-host/source document cap — the crawl-boilerplate control a
    web pipeline applies so no single site dominates training data.
    Deterministic rule: keep the k lowest doc_ids per group."""
    return grouped_head(docs_ds, group_col, k, order_cols=["doc_id"])


def stratified_sample(
    docs_ds, group_col: str = "lang", n: int = 30, salt: str = "v1"
):
    """Deterministic stratified sample: n docs per group, chosen by
    salted-md5 rank (pseudo-random but reproducible and SQL-auditable;
    the salt versions the draw).  Output keeps the input columns."""

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_h", pa.array(salt_hash60(ids, salt), type=pa.int64())
        )

    out = grouped_head(
        docs_ds.map_batches(add_key, batch_format="pyarrow"),
        group_col,
        n,
        order_cols=["_h", "doc_id"],
    )
    return out.drop_columns(["_h"])


# ---------------------------------------------------------------------------
# Weighted source mixing (up/down-sampling by deterministic repeats)
# ---------------------------------------------------------------------------


def weighted_mix(
    docs_ds,
    weights_pm: dict[str, int],
    group_col: str = "source",
    salt: str = "mix:v1",
    default_pm: int = 1000,
):
    """Domain/source mixture weighting: emit each doc ``w/1000`` times,
    with the fractional part resolved by a salted-hash Bernoulli draw —
    the deterministic up/down-sampling rule a training pipeline uses to
    hit a target domain mixture (weights in permille so the rule is
    exact integer arithmetic, bit-auditable by a SQL window).

    Output: (doc_id, group_col, copy) with copy = 1..repeat.  Stateless
    vectorized map over a broadcast weight dict — no shuffle; repeats
    land in the emitting task's block (downstream shuffles, if any,
    spread them).
    """

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        grp = batch[group_col].to_pylist()
        w = np.fromiter(
            (int(weights_pm.get(g, default_pm)) for g in grp),
            dtype=np.int64,
            count=len(grp),
        )
        rep = w // 1000 + (salt_hash60(ids, salt) % 1000 < w % 1000)
        idx = np.repeat(np.arange(len(ids)), rep)
        stop = np.cumsum(rep)
        copy = np.arange(int(stop[-1]) if len(stop) else 0) - np.repeat(
            stop - rep, rep
        ) + 1
        return pa.table(
            {
                "doc_id": pa.array(ids[idx]),
                group_col: pa.array(
                    np.asarray(grp, dtype=object)[idx], type=pa.string()
                ),
                "copy": pa.array(copy, type=pa.int64()),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Token-budget head: greedy prefix by deterministic priority
# ---------------------------------------------------------------------------


def token_budget_head(
    docs_ds, budget: int, salt: str = "tb:v1", num_ranges: int = 4096
):
    """Take documents in deterministic (salted-hash, doc_id) priority
    order until the cumulative token count would exceed ``budget``
    (inclusive-prefix rule: keep rows whose running sum <= budget) —
    how a pipeline cuts a corpus down to a target token budget
    reproducibly.

    Never sorts the corpus.  The 60-bit priority key is uniform, so
    fixed-width KEY-RANGE buckets (top bits) give a balanced histogram:
    (1) one tokenize pass builds a slim (doc_id, h, dl) projection
        (materialized: ~24 B/doc — the only O(docs) state, spillable);
    (2) per-range token sums reduce to the driver (num_ranges rows;
        one combine level absorbs 10^7-batch inputs);
    (3) the driver cumsums ranges to find the single boundary range,
        fetches only ITS rows (≈ docs/num_ranges, uniform by
        construction), and computes the exact in-range cutoff;
    (4) a stateless filter emits the kept rows.
    Same two-pass shape as the grouped-quantile operator.
    """
    from mini_ivf_ray.functions.tokenize import tokenize_batch

    shift = 60 - int(num_ranges - 1).bit_length()

    def project(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, dls = tokenize_batch(batch["text"].to_pylist())
        h = salt_hash60(ids, salt)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "h": pa.array(h, type=pa.int64()),
                "dl": pa.array(dls, type=pa.int64()),
                "rng": pa.array(h >> shift, type=pa.int64()),
            }
        )

    slim = docs_ds.map_batches(project, batch_format="pyarrow").materialize()

    def range_sums(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("rng", sort=True)["dl"].sum()
        return pa.table(
            {
                "rng": pa.array(df.index.to_numpy(np.int64)),
                "s": pa.array(df.to_numpy(np.int64)),
            }
        )

    hist = (
        slim.map_batches(range_sums, batch_format="pyarrow")
        .to_pandas()
        .groupby("rng", sort=True)["s"]
        .sum()
    )
    cum = hist.cumsum()
    full = cum[cum <= budget]
    # ranges fully inside the budget
    last_full = int(full.index[-1]) if len(full) else -1
    spent = int(full.iloc[-1]) if len(full) else 0
    boundary = hist.index[hist.index > last_full]
    cut_h, cut_id = None, None
    b = int(boundary[0]) if len(boundary) else None
    if b is not None:
        bt = (
            slim.map_batches(
                lambda t: t.filter(pa.compute.equal(t["rng"], b)),
                batch_format="pyarrow",
            )
            .to_pandas()
            .sort_values(["h", "doc_id"], kind="mergesort")
        )
        run = spent + bt["dl"].cumsum()
        keep = bt[run <= budget]
        if len(keep):
            cut_h = int(keep["h"].iloc[-1])
            cut_id = int(keep["doc_id"].iloc[-1])

    def emit(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        m = df["rng"] <= last_full
        if cut_h is not None:
            m |= (df["rng"] == b) & (
                (df["h"] < cut_h)
                | ((df["h"] == cut_h) & (df["doc_id"] <= cut_id))
            )
        out = df[m]
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(np.int64)),
                "dl": pa.array(out["dl"].to_numpy(np.int64)),
            }
        )

    return slim.map_batches(emit, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Sequence packing: greedy doc -> fixed-length training-sequence layout
# ---------------------------------------------------------------------------


def pack_sequences(docs_ds, budget: int, num_ranges: int | None = None):
    """Greedy sequence packing: concatenate documents in doc_id order
    and chunk the token stream into fixed ``budget``-token training
    sequences — the layout step every LLM pretraining pipeline runs
    before writing tokenized shards.  Each document is assigned the
    sequence it STARTS in (``seq_id``) and its token offset there
    (``seq_off``); a document longer than the remaining room simply
    straddles into the following sequence(s), as in real packing.

    Never sorts the corpus.  The global prefix sum is decomposed as a
    distributed scan (same two-pass shape as ``token_budget_head``):
      (1) one tokenize pass builds a slim (doc_id, dl) projection
          (~16 B/doc, the only O(docs) state, spillable);
      (2) docs bucket into LINEAR doc_id ranges over [min, max]
          (balanced for sequential or uniform-hash id layouts; id skew
          degrades balance, never correctness);
      (3) per-range token sums reduce to the driver (num_ranges rows)
          and one cumsum yields each range's global start offset;
      (4) one slim bucketed exchange co-locates each range; a local
          doc_id sort + cumsum + the broadcast range offset gives every
          document its exact global prefix.
    Output: (doc_id, dl, seq_id, seq_off).
    """
    import pyarrow.compute as pc
    import ray

    from mini_ivf_ray.functions.tokenize import tokenize_batch

    if num_ranges is None:
        num_ranges = max(64, 8 * int(ray.cluster_resources().get("CPU", 8)))

    def project(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, dls = tokenize_batch(batch["text"].to_pylist())
        return pa.table(
            {"doc_id": pa.array(ids), "dl": pa.array(dls, type=pa.int64())}
        )

    slim = docs_ds.map_batches(project, batch_format="pyarrow").materialize()

    mm = slim.map_batches(
        lambda t: pa.table(
            {
                "lo": pa.array([pc.min(t["doc_id"]).as_py()], type=pa.int64()),
                "hi": pa.array([pc.max(t["doc_id"]).as_py()], type=pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    if not len(mm):
        return slim.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "dl": pa.array([], type=pa.int64()),
                    "seq_id": pa.array([], type=pa.int64()),
                    "seq_off": pa.array([], type=pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    lo = int(mm["lo"].min())
    width = max(1, (int(mm["hi"].max()) - lo) // num_ranges + 1)

    def add_rng(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        return batch.append_column(
            "rng", pa.array((ids - lo) // width, type=pa.int64())
        )

    ranged = slim.map_batches(add_rng, batch_format="pyarrow")

    def range_sums(batch: pa.Table) -> pa.Table:
        s = batch.to_pandas().groupby("rng", sort=True)["dl"].sum()
        return pa.table(
            {
                "rng": pa.array(s.index.to_numpy(np.int64)),
                "s": pa.array(s.to_numpy(np.int64)),
            }
        )

    hist = (
        ranged.map_batches(range_sums, batch_format="pyarrow")
        .to_pandas()
        .groupby("rng", sort=True)["s"]
        .sum()
    )
    cum = hist.cumsum()
    starts = {int(r): int(cum[r]) - int(hist[r]) for r in hist.index}

    def pack_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort")
        dl = df["dl"].to_numpy(np.int64)
        before = starts.get(int(df["rng"].iloc[0]), 0) + np.cumsum(dl) - dl
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "dl": dl,
                "seq_id": before // budget,
                "seq_off": before % budget,
            }
        )

    return ranged.groupby("rng").map_groups(pack_group, batch_format="pandas")


def clip_tokens(docs_ds, max_tokens: int = 64):
    """Context-length clipping: keep the first ``max_tokens`` tokens of
    each doc (re-joined with single spaces), report the original token
    count and whether the doc was clipped.  Stateless vectorized map —
    the standard pre-tokenizer truncation step of a training pipeline."""
    import pyarrow as pa

    from mini_ivf_ray.functions.tokenize import tokenize_batch

    def fn(batch: pa.Table) -> pa.Table:
        toks, dls = tokenize_batch(batch["text"].to_pylist())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text_clip": pa.array(
                    [" ".join(t[:max_tokens]) for t in toks], type=pa.string()
                ),
                "n_tokens": pa.array(dls, type=pa.int64()),
                "clipped": pa.array(dls > max_tokens, type=pa.bool_()),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def chunk_documents(
    docs_ds,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
):
    """Split documents into fixed-size overlapping token windows — the
    context-length chunking step RAG/embedding pipelines run before
    encoding (``pack_sequences``'s sibling: packing concatenates short
    docs, chunking splits long ones).

    Chunk ``i`` covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; a doc of n <= chunk_tokens tokens
    yields exactly one chunk, else 1 + ceil((n - chunk_tokens) /
    stride) — every token belongs to >= 1 chunk, consecutive chunks
    share ``overlap`` tokens.  Stateless per-batch flat map (one output
    row per chunk), zero shuffle; deterministic, so the DuckDB
    list-slice oracle replays it exactly.

    Output: (doc_id, chunk_id, n_tokens, chunk) with chunk the
    space-joined token window (empty string for an empty document's
    single chunk, matching coalesce(array_to_string(...), ''))."""
    import pyarrow as pa

    from mini_ivf_ray.functions.tokenize import tokenize

    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_d, out_c, out_n, out_t = [], [], [], []
        for did, text in zip(ids, batch[text_col].to_pylist()):
            toks = tokenize(text)
            n = len(toks)
            nch = 1 if n <= chunk_tokens else 1 + -(-(n - chunk_tokens) // stride)
            for i in range(nch):
                lo = i * stride
                hi = min(n, lo + chunk_tokens)
                out_d.append(int(did))
                out_c.append(i)
                out_n.append(max(0, hi - lo))
                out_t.append(" ".join(toks[lo:hi]))
        return pa.table(
            {
                "doc_id": pa.array(out_d, type=pa.int64()),
                "chunk_id": pa.array(out_c, type=pa.int64()),
                "n_tokens": pa.array(out_n, type=pa.int64()),
                "chunk": pa.array(out_t, type=pa.string()),
            }
        )

    return docs_ds.map_batches(explode, batch_format="pyarrow")


def grouped_split(
    docs_ds,
    key_col: str,
    salt: str = "v1",
    train_permille: int = 980,
    val_permille: int = 990,
):
    """LEAKAGE-SAFE train/val/test split: every row of a GROUP (e.g. a
    registered domain) lands in the same split — the assignment hashes
    the group key, not the row id, so near-duplicate pages from one
    site can never straddle train and test (the contamination
    stable_split cannot prevent).  Same permille rule and md5 form as
    stable_split; stateless map, zero shuffle, per-batch distinct-key
    hash cache (Zipf domains make it ~free).

    Output: (doc_id, <key_col>, bucket, split)."""
    import hashlib

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        cache: dict[str, int] = {}
        buckets = np.empty(len(keys), dtype=np.int64)
        for i, k in enumerate(keys):
            b = cache.get(k)
            if b is None:
                h = hashlib.md5(f"{k}:{salt}".encode()).digest()
                b = (int.from_bytes(h[:8], "big") >> 4) % 1000
                cache[k] = b
            buckets[i] = b
        split = np.where(
            buckets < train_permille,
            "train",
            np.where(buckets < val_permille, "val", "test"),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                key_col: batch[key_col],
                "bucket": pa.array(buckets, type=pa.int64()),
                "split": pa.array(split.astype(object), type=pa.string()),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Seeded global shuffle for training export
# ---------------------------------------------------------------------------


def seeded_shuffle(docs_ds, seed: int = 0, n_shards: int = 8):
    """(doc_id, shard, pos): a deterministic seeded global shuffle —
    the operator that turns a cleaned corpus into training shards with
    a reproducible random order (every framework's data loader wants
    ``shard = f(id, seed)``, ``pos = rank of g(id, seed) within the
    shard``, stable across reruns and resumable per shard).

    shard and order use INDEPENDENT md5 salts (``shuf-shard:{seed}`` /
    ``shuf-order:{seed}``), so shard membership and within-shard order
    are uncorrelated; both replay in SQL via the ``('0x' ||
    substr(md5(...), 1, 15))::UBIGINT`` form shared with stable_split.

    Scale shape: ONE exchange (groupby shard) and a per-shard sort —
    choose ``n_shards`` >= cluster cores so each shard fits one
    worker (the shard is also the natural output-file/resume unit);
    the stateless key map recomputes anywhere, so a failed shard
    rebuilds alone.
    """
    order_salt = f"shuf-order:{seed}"
    shard_salt = f"shuf-shard:{seed}"

    def keyfn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "shard": pa.array(
                    salt_hash60(ids, shard_salt) % n_shards, type=pa.int64()
                ),
                "okey": pa.array(
                    salt_hash60(ids, order_salt), type=pa.int64()
                ),
            }
        )

    def shard_sort(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["okey", "doc_id"], kind="mergesort")
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "shard": g["shard"].to_numpy(),
                "pos": np.arange(len(g), dtype=np.int64),
            }
        )

    keyed = docs_ds.map_batches(keyfn, batch_format="pyarrow")
    return keyed.groupby("shard").map_groups(shard_sort, batch_format="pandas")
