"""Benchmark harness (driver-run per round -> BENCH_r{N}.json).

Headline pipeline (the reference's measurement protocol, BASELINE.md):
index-build throughput (docs/s) + BM25 top-10 query QPS, measured over a
deterministic synthetic Common-Crawl-style pages corpus (the sf tables
are too small to exercise parallelism), plus timed operator benchmarks
over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ..., "qps": ...}

--scaling: runs the same job in two fresh taskset-confined processes
(default num_cpus=4 and 16 — below the single node's memory-bandwidth
saturation point, see BASELINE.md) and reports both throughputs +
scaling efficiency (the sandbox stand-in for the north_rule's N vs
4N-node cluster runs).  Override with GRAFT_SCALING_LEVELS="8,32".
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import warnings

warnings.filterwarnings("ignore")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("GRAFT_BENCH_DOCS", "400000"))
BENCH_QUERIES = int(os.environ.get("GRAFT_BENCH_QUERIES", "6000"))
PAGES_DIR = f"/tmp/graft_bench_pages_{BENCH_DOCS}"
# scaling mode runs build + steady-state query only: the efficiency ratio
# uses just those walls, and the skipped stages (append, cold path, operator
# benchmarks) would widen the host-drift window between interleaved levels
FAST = os.environ.get("GRAFT_BENCH_FAST", "") == "1"


def _host_probe() -> float:
    """Fixed single-core work (numpy sort of 2M floats x5): an
    engine-independent host-speed witness, ~0.25 s on a healthy core.
    The sandbox VM shares a physical host with external tenants; when
    the hypervisor steals cycles every wall-clock number inflates while
    the engine's work (avg_searched_cnt) stays bit-identical.  Reporting
    the probe alongside lets a reader attribute wall deltas to host
    state instead of guessing."""
    import numpy as np

    a = np.random.default_rng(1).random(2_000_000)
    t0 = time.perf_counter()
    for _ in range(5):
        np.sort(a)
    return round(time.perf_counter() - t0, 3)


def _alloc_probe() -> float:
    """Fresh-page first-touch throughput in GB/s (200 MB ones()).
    The third host witness: this box's hypervisor intermittently
    throttles page ACQUISITION ~100-250x (measured 0.02 GB/s vs ~5
    healthy) while steal reads 0% and cache-resident compute is
    unaffected — the signature that flattens high-parallelism levels
    (more fresh worker heaps) and memory-heavy stages first."""
    import numpy as np

    t0 = time.perf_counter()
    a = np.ones(25_000_000, dtype=np.float64)
    dt = time.perf_counter() - t0
    nbytes = a.nbytes
    del a
    return round(nbytes / dt / 1e9, 2)


def _cpu_times() -> list[int]:
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def _steal_pct(stat0: list[int], stat1: list[int]) -> float:
    """% of all CPU time the hypervisor stole between two /proc/stat
    snapshots (field 8).  >5% means an external tenant is active."""
    d = [b - a for a, b in zip(stat0, stat1)]
    return round(100.0 * d[7] / max(1, sum(d)), 2)


def _bench_queries(n: int, seed: int = 9):
    """Deterministic query workload over the bench corpus vocabulary
    (head + tail mix, reference analog: nq=1000 query set)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    head = ["the", "a", "of", "to", "and", "in", "data", "web", "page", "time"]
    out = []
    for qid in range(n):
        k = int(rng.integers(1, 5))
        terms = [
            head[int(rng.integers(0, len(head)))]
            if rng.random() < 0.3
            else f"w{int(rng.integers(10, 5000)):05d}"
            for _ in range(k)
        ]
        out.append((qid, " ".join(terms)))
    return out


def run_bench() -> dict:
    import ray

    probe_pre = _host_probe()
    alloc_pre = _alloc_probe()
    stat0 = _cpu_times()
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from mini_ivf_ray.config import PipelineConfig
    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.pipelines.query import search
    from mini_ivf_ray.sources.pages import write_pages_corpus

    timings: dict[str, float] = {}

    # ---- corpus (generation untimed, cached across runs) ----------------
    write_pages_corpus(PAGES_DIR, BENCH_DOCS, seed=42, num_files=64)
    # small files coalesce to 1-2 blocks under size-based splitting,
    # serializing the extract stage — force CPU-scaled read parallelism
    pages_factory = lambda: ray.data.read_parquet(  # noqa: E731
        PAGES_DIR, override_num_blocks=max(64, 4 * NUM_CPUS)
    )
    # warm pass: parquet count() is satisfied from file METADATA, so a
    # bare count() neither reads the data nor spawns workers — round-3's
    # pass-1 build paid first-disk-read + 32 worker spawns + per-worker
    # imports inside the measured wall (observed 23.9 s pass 1 vs 9.9 s
    # pass 2 at 0.2% steal).  Force a real read through a map_batches so
    # the page cache, the worker pool, and the hot imports are warm
    # BEFORE timing starts; the warm cost itself is reported.
    def _warm(batch):
        import pyarrow as _pa

        from mini_ivf_ray.functions import tokenize as _tok  # noqa: F401

        return _pa.table({"n": _pa.array([batch.num_rows])})

    t0 = time.perf_counter()
    pages_factory().map_batches(_warm, batch_format="pyarrow").count()
    timings["warm_read"] = round(time.perf_counter() - t0, 3)

    cfg = PipelineConfig(
        num_partitions=64,           # smaller encode tasks -> lower straggler floor
        hot_df_threshold=100_000,    # salt head terms harder for balance
        query_concurrency=NUM_CPUS,
        tokenize_batch_size=512,
        topk=10,
    )

    # ---- index build (reference: Timer around Populate) -----------------
    idx = f"/tmp/graft_bench_idx_{NUM_CPUS}"
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.perf_counter()
    meta = build_index(pages_factory, idx, cfg)
    build_sec = time.perf_counter() - t0
    n_docs = meta["n_docs"]
    timings["build_index"] = round(build_sec, 3)
    timings["build_stats_pass"] = meta["counters"]["stats_wall_sec"]
    timings["build_populate"] = meta["counters"]["populate_wall_sec"]
    # per-stage walls: the paired stage-level scaling evidence
    # (BASELINE.md round-4 protocol) drops out of every bench run
    for k_src, k_out in (
        ("prepare_wall_sec", "build_prepare"),
        ("spill_wall_sec", "build_spill"),
        ("encode_wall_sec", "build_encode"),
        ("merge_wall_sec", "build_merge"),
    ):
        if k_src in meta["counters"]:
            timings[k_out] = meta["counters"][k_src]

    # ---- query serving (reference: Timer around the query loop) ---------
    # steady-state QPS on a persistent warmed pool (the reference times
    # its query loop against an already-resident index); pool spin-up +
    # cache warm-up is reported separately
    from mini_ivf_ray.pipelines.serving import ServingPool

    queries = _bench_queries(BENCH_QUERIES)
    t0 = time.perf_counter()
    pool = ServingPool(idx, cfg, num_actors=NUM_CPUS)
    t_ctor = time.perf_counter()
    pool.warmup(queries[: min(300, len(queries))])
    timings["spinup_ctor"] = round(t_ctor - t0, 3)
    timings["query_pool_spinup"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    res = pool.search(queries)
    query_sec = time.perf_counter() - t0
    n_res = len(res)
    timings["query_topk"] = round(query_sec, 3)
    # snapshot BEFORE the repeat: avg_searched_cnt is the cross-round
    # determinism witness (bit-identical r2/r3), so its composition
    # (warmup + exactly one measured pass) must not change
    pool_metrics = pool.metrics()
    if FAST:
        # scaling mode needs the STEADY-STATE query wall too: MaxScore
        # cut per-query compute 5.4x, so pass 1 over a small workload
        # is dominated by per-actor first-touch + dispatch floors —
        # a ratio of those measures Ray's constants, not the engine
        t0 = time.perf_counter()
        pool.search(queries)
        query_sec2 = time.perf_counter() - t0
        timings["query_topk_repeat"] = round(query_sec2, 3)
        timings["qps_steady"] = round(
            BENCH_QUERIES / min(query_sec, query_sec2), 1
        )
    if not FAST:
        # bench-internal repeat: the same warmed pool serves the same
        # workload again — the spread between the passes separates
        # engine throughput from single-node host drift (one bad sample
        # defined round 3's headline), and the repeat IS the steady
        # state the reference measures (resident index, warm caches)
        t0 = time.perf_counter()
        pool.search(queries)
        query_sec2 = time.perf_counter() - t0
        timings["query_topk_repeat"] = round(query_sec2, 3)
        timings["qps_steady"] = round(
            BENCH_QUERIES / min(query_sec, query_sec2), 1
        )
    pool.shutdown()

    if FAST:
        ray.shutdown()
        headline = round(build_sec + query_sec, 3)
        return {
            "metric": "index-build + BM25 top-10 query wall time "
            f"({n_docs} docs, {BENCH_QUERIES} queries; fast/scaling mode)",
            "value": headline,
            "unit": "sec",
            "queries": timings,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "n_docs": n_docs,
            "n_results": n_res,
            "docs_per_sec": round(n_docs / build_sec, 1),
            "qps": round(BENCH_QUERIES / query_sec, 1),
            "avg_searched_cnt": pool_metrics.get("avg_searched_cnt", 0),
            "host_probe_sec": [probe_pre, _host_probe()],
            "host_alloc_gbps": [alloc_pre, _alloc_probe()],
            "host_steal_pct": _steal_pct(stat0, _cpu_times()),
        }

    # cold-burst Dataset path (one-shot map_batches pool), for reference
    qds = ray.data.from_items([{"query_id": q, "text": t} for q, t in queries[:1000]])
    t0 = time.perf_counter()
    search(idx, qds, cfg).count()
    timings["query_topk_cold_1000"] = round(time.perf_counter() - t0, 3)

    # docID-range-sharded serving (ShardedIndex): spinup + the same
    # 2000-query workload — the per-node-decodes-1/R-of-the-index shape;
    # rank-identity vs the pool path is pytest-pinned, this row tracks
    # its COST (per-shard decode + fan-out/merge overhead)
    from mini_ivf_ray.pipelines.serving import ShardedIndex

    t0 = time.perf_counter()
    sharded = ShardedIndex(idx, cfg, num_shards=min(8, NUM_CPUS))
    sharded.search(queries[:100])  # warm per-shard range caches
    timings["sharded_spinup"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    n_sh = len(sharded.search(queries[:2000]))
    w = time.perf_counter() - t0
    timings["query_sharded_2000"] = round(w, 3)
    timings["qps_sharded"] = round(2000 / w, 1)
    sharded.shutdown()
    assert n_sh > 0

    # ---- incremental append (reference: LoadIndex -> Populate) ----------
    # append 10% new docs to a COPY of the committed index: measures the
    # re-encode-without-re-tokenize path end-to-end
    from mini_ivf_ray.pipelines.append import append_index

    inc_docs = max(1000, BENCH_DOCS // 10)
    inc_dir = f"/tmp/graft_bench_pages_inc_{inc_docs}"
    write_pages_corpus(inc_dir, inc_docs, seed=77, num_files=8)

    def inc_factory():
        import pyarrow as pa
        import pyarrow.compute as pc

        def resuffix(batch: pa.Table) -> pa.Table:
            # disjoint url space vs the base corpus (same generator ids)
            urls = pc.binary_join_element_wise(
                batch["url"], pa.scalar("?inc=1"), pa.scalar("")
            )
            return batch.set_column(
                batch.column_names.index("url"), "url", urls
            )

        return ray.data.read_parquet(
            inc_dir, override_num_blocks=max(16, NUM_CPUS)
        ).map_batches(resuffix, batch_format="pyarrow")

    idx_inc = idx + "_inc"
    shutil.rmtree(idx_inc, ignore_errors=True)
    shutil.copytree(idx, idx_inc)
    t0 = time.perf_counter()
    append_index(inc_factory, idx_inc, cfg)
    append_sec = time.perf_counter() - t0
    timings["append_10pct"] = round(append_sec, 3)
    timings["append_docs_per_sec"] = round(inc_docs / append_sec, 1)
    shutil.rmtree(idx_inc, ignore_errors=True)

    # ---- multi-epoch query-cost bound + auto-compaction ------------------
    # incremental append defers work to decode-time bound recomputation;
    # this measures what that costs a 5-epoch index (base + 4 increments)
    # vs the same corpus compacted, and exercises the maybe_compact policy
    # (maintenance.py) that bounds the overhead in recurring-crawl use
    from mini_ivf_ray.pipelines.maintenance import index_epochs, maybe_compact

    epoch_docs = max(500, BENCH_DOCS // 20)
    idx5 = idx + "_5ep"
    shutil.rmtree(idx5, ignore_errors=True)
    shutil.copytree(idx, idx5)
    t0 = time.perf_counter()
    for ep in range(4):
        ep_dir = f"/tmp/graft_bench_pages_ep{ep}_{epoch_docs}"
        write_pages_corpus(ep_dir, epoch_docs, seed=100 + ep, num_files=8)

        def ep_factory(ep_dir=ep_dir, ep=ep):
            import pyarrow as pa
            import pyarrow.compute as pc

            def resuffix(batch: pa.Table) -> pa.Table:
                urls = pc.binary_join_element_wise(
                    batch["url"], pa.scalar(f"?ep={ep}"), pa.scalar("")
                )
                return batch.set_column(
                    batch.column_names.index("url"), "url", urls
                )

            return ray.data.read_parquet(
                ep_dir, override_num_blocks=max(16, NUM_CPUS)
            ).map_batches(resuffix, batch_format="pyarrow")

        append_index(ep_factory, idx5, cfg)
    timings["append_4x5pct"] = round(time.perf_counter() - t0, 3)
    timings["index_epochs_after"] = index_epochs(idx5, cfg)

    def _pool_measure(path, tag):
        t0 = time.perf_counter()
        p = ServingPool(path, cfg, num_actors=NUM_CPUS)
        p.warmup(queries[:300])
        timings[f"spinup_{tag}"] = round(time.perf_counter() - t0, 3)
        sub = queries[:2000]
        t0 = time.perf_counter()
        p.search(sub)
        w1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        p.search(sub)
        w2 = time.perf_counter() - t0
        p.shutdown()
        timings[f"query_topk_{tag}"] = round(min(w1, w2), 3)
        return min(w1, w2)

    w5 = _pool_measure(idx5, "5epoch")
    t0 = time.perf_counter()
    res5 = maybe_compact(idx5, cfg, max_epochs=4)  # 5 epochs > 4: triggers
    timings["auto_compact"] = round(time.perf_counter() - t0, 3)
    assert res5["compacted"] and timings["index_epochs_after"] == 5
    wc = _pool_measure(idx5, "compacted_after_5")
    timings["epoch_overhead_x"] = round(w5 / wc, 2) if wc > 0 else 0.0
    shutil.rmtree(idx5, ignore_errors=True)

    # ---- build repeat: host-drift separation for the BUILD wall ------
    # (the query side already has query_topk_repeat; round 3's headline
    # was defined by one degraded sample — a second build bounds how
    # much of the pass-1 wall was host state vs engine)
    idx_rep = idx + "_rep"
    shutil.rmtree(idx_rep, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(pages_factory, idx_rep, cfg)
    build_sec2 = time.perf_counter() - t0
    timings["build_index_repeat"] = round(build_sec2, 3)
    shutil.rmtree(idx_rep, ignore_errors=True)


    # ---- operator benchmarks over the sf dir ----------------------------
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    for name in ["term_df", "tokenize_postings", "quality", "lsh_near_dup",
                 "ann_bruteforce", "docs_lang_join", "clean_corpus", "dl_quantiles",
                 "events_hopping", "dedup_clusters", "tpch_q1",
                 # round-5 web-graph family (fixed-point BSP rounds /
                 # doubling joins over the synthetic multigraph)
                 "pagerank", "redirects", "cocitation"]:
        t0 = time.perf_counter()
        res = qs[name](SF_DIR)
        if hasattr(res, "count"):
            res.count()
        timings[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()

    headline = round(build_sec + query_sec, 3)
    return {
        "metric": "index-build + BM25 top-10 query wall time "
        f"({n_docs} docs, {BENCH_QUERIES} queries)",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "n_results": n_res,
        "docs_per_sec": round(n_docs / build_sec, 1),
        "docs_per_sec_best": round(n_docs / min(build_sec, build_sec2), 1),
        "qps": round(BENCH_QUERIES / query_sec, 1),
        "avg_searched_cnt": pool_metrics.get("avg_searched_cnt", 0),
        "host_probe_sec": [probe_pre, _host_probe()],
        "host_alloc_gbps": [alloc_pre, _alloc_probe()],
        "host_steal_pct": _steal_pct(stat0, _cpu_times()),
    }


def run_scaling() -> dict:
    """Same job, fresh processes, N vs 4N CPUs (default 4 vs 16: below
    the single node's memory-bandwidth saturation point — added cluster
    NODES bring their own DRAM bandwidth, added local cores don't;
    GRAFT_SCALING_LEVELS="8,32" for the saturated datapoint)."""
    lo_n, hi_n = (
        int(x) for x in os.environ.get("GRAFT_SCALING_LEVELS", "4,16").split(",")
    )

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_FAST="1")
        # enough queries that the HI level's steady pass is seconds of
        # real scoring, not a dispatch floor (same workload both levels)
        env.setdefault("GRAFT_BENCH_QUERIES", "24000")
        # taskset: a num_cpus=8 Ray session still schedules its workers
        # across all physical cores; confining the process tree to ncpu
        # cores is the honest N-vs-4N stand-in
        cmd = [sys.executable, os.path.abspath(__file__)]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, check=True
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # Interleaved repeats + per-level MEDIANS: the sandbox host drifts
    # ±30% over the minutes a level takes, so a single lo/hi pair is a
    # two-point ratio of two different machine states (observed 0.65 to
    # 0.98 on identical code).  Interleaving levels and taking the
    # median wall per level before forming the ratio measures the CODE,
    # not the drift.  Every raw run is still reported.
    #
    # Steal-aware sampling (declared protocol, not post-hoc pruning):
    # this VM shares a physical host with external tenants; measured
    # hypervisor steal reaches 40-55% for minutes at a time.  A sample
    # whose run-wide steal exceeds GRAFT_SCALING_MAX_STEAL (default 5%)
    # measures the tenant, not the code — it is set aside into
    # rejected_runs (fully reported) and the slot is resampled, up to
    # 2x the requested repeats in total attempts per level.
    reps = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
    max_steal = float(os.environ.get("GRAFT_SCALING_MAX_STEAL", "5"))
    los, his, rejected = [], [], []

    def sample(n: int, acc: list) -> None:
        for _ in range(2):  # at most one resample per slot
            r = run(n)
            if r.get("host_steal_pct", 0.0) <= max_steal:
                acc.append(r)
                return
            rejected.append(
                {"cpus": n, "steal_pct": r.get("host_steal_pct"),
                 "build": r["queries"]["build_index"],
                 "query": r["queries"]["query_topk"]}
            )
        acc.append(r)  # hand back the last sample rather than starve

    for _ in range(reps):
        sample(lo_n, los)
        sample(hi_n, his)

    def med(vals):
        s = sorted(vals)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    def steady_q(r):
        # steady-state query wall: min of the two passes (the repeat
        # exists precisely to strip per-actor first-touch from pass 1)
        return min(
            r["queries"]["query_topk"],
            r["queries"].get("query_topk_repeat", r["queries"]["query_topk"]),
        )

    lo_b = med([r["queries"]["build_index"] for r in los])
    hi_b = med([r["queries"]["build_index"] for r in his])
    lo_q = med([steady_q(r) for r in los])
    hi_q = med([steady_q(r) for r in his])
    lo_v = med([r["queries"]["build_index"] + steady_q(r) for r in los])
    hi_v = med([r["queries"]["build_index"] + steady_q(r) for r in his])
    eff = (lo_v / hi_v) / (hi_n / lo_n)
    result = {
        "metric": f"scaling efficiency ({lo_n} vs {hi_n} CPUs, same corpus + queries; "
        f"median of {reps} interleaved runs per level)",
        "cpus_lo": lo_n,
        "cpus_hi": hi_n,
        "sec_lo": round(lo_v, 3),
        "sec_hi": round(hi_v, 3),
        "docs_per_sec_lo": med([r["docs_per_sec"] for r in los]),
        "docs_per_sec_hi": med([r["docs_per_sec"] for r in his]),
        "qps_lo": med([r["qps"] for r in los]),
        "qps_hi": med([r["qps"] for r in his]),
        "build_eff": round((lo_b / hi_b) / (hi_n / lo_n), 3),
        "query_eff": round((lo_q / hi_q) / (hi_n / lo_n), 3),
        "scaling_efficiency": round(eff, 3),
        # raw per-run walls (honesty: medians above derive from these);
        # steal = % CPU the hypervisor gave to external tenants during
        # that subprocess, probe = fixed single-core work seconds —
        # the host-state witnesses for each raw sample
        "runs_lo": [
            {"build": r["queries"]["build_index"], "query": r["queries"]["query_topk"],
             "query_steady": steady_q(r),
             "steal_pct": r.get("host_steal_pct"), "probe": r.get("host_probe_sec"),
             "alloc_gbps": r.get("host_alloc_gbps")}
            for r in los
        ],
        "runs_hi": [
            {"build": r["queries"]["build_index"], "query": r["queries"]["query_topk"],
             "query_steady": steady_q(r),
             "steal_pct": r.get("host_steal_pct"), "probe": r.get("host_probe_sec"),
             "alloc_gbps": r.get("host_alloc_gbps")}
            for r in his
        ],
        # samples set aside by the declared steal threshold (resampled)
        "rejected_runs": rejected,
        "max_steal_pct": max_steal,
        # per-stage walls (first run each): which stage stops scaling is
        # the actionable datum, not just the ratio
        "stages_lo": {k: los[0]["queries"][k] for k in
                      ("build_index", "build_prepare", "build_stats_pass",
                       "build_spill", "build_encode", "build_merge",
                       "build_populate", "query_topk")
                      if k in los[0]["queries"]},
        "stages_hi": {k: his[0]["queries"][k] for k in
                      ("build_index", "build_prepare", "build_stats_pass",
                       "build_spill", "build_encode", "build_merge",
                       "build_populate", "query_topk")
                      if k in his[0]["queries"]},
    }
    return result


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
