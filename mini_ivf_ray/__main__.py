"""CLI entry points: ``python -m mini_ivf_ray <cmd>``.

The CLI owns its Ray session (library code never calls ray.init).

  build       <pages_parquet_dir> <index_dir> [--partitions N] [--no-dedup]
  append      <pages_parquet_dir> <index_dir> [--no-dedup]   (incremental:
              add a new batch without re-tokenizing the old corpus)
  query       <index_dir> "terms ..." [--topk K]
  stats       <index_dir>
  synth       <out_dir> --docs N [--seed S]
  groundtruth <embeddings_parquet> <out_prefix> [--k K] [--nq N]
              [--metric cosine|l2]   (reference toolkits/get_groundtruth
              .cpp: exhaustive top-k -> .ivecs neighbors + .fvecs scores)
"""

from __future__ import annotations

import argparse
import json
import sys


def _session(num_cpus: int | None) -> bool:
    """Init Ray if nobody else owns a session; returns True iff WE
    initialized it (and should therefore shut it down)."""
    import ray

    owned = False
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
        owned = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return owned


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="mini_ivf_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("pages")
    b.add_argument("index_dir")
    b.add_argument("--partitions", type=int, default=16)
    b.add_argument("--no-dedup", action="store_true")

    ap = sub.add_parser("append")
    ap.add_argument("pages")
    ap.add_argument("index_dir")
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument(
        "--mode",
        choices=("auto", "incremental", "rewrite"),
        default="auto",
        help="incremental: encode only the increment into new segment "
        "files (cost ~ increment size, the default via auto); rewrite: "
        "re-encode every partition under union stats (byte-identical "
        "to a fresh union build)",
    )
    ap.add_argument(
        "--skip-existing",
        action="store_true",
        help="drop increment docs whose url is already indexed "
        "(re-crawl mode) instead of raising",
    )

    q = sub.add_parser("query")
    q.add_argument("index_dir")
    q.add_argument("text")
    q.add_argument("--topk", type=int, default=10)

    s = sub.add_parser("stats")
    s.add_argument("index_dir")

    dl = sub.add_parser(
        "delete", help="tombstone doc ids (take-downs); search masks them "
        "immediately, compact removes them physically"
    )
    dl.add_argument("index_dir")
    dl.add_argument("doc_ids", nargs="+", type=int)
    dl.add_argument("--ignore-missing", action="store_true")

    cp = sub.add_parser(
        "compact", help="rewrite segments without tombstoned docs and "
        "recompute exact statistics"
    )
    cp.add_argument("index_dir")

    g = sub.add_parser("synth")
    g.add_argument("out_dir")
    g.add_argument("--docs", type=int, required=True)
    g.add_argument("--seed", type=int, default=42)

    gt = sub.add_parser(
        "groundtruth",
        help="exhaustive top-k over an embeddings parquet -> .ivecs ids "
        "+ .fvecs scores (reference toolkits/get_groundtruth.cpp)",
    )
    gt.add_argument("embeddings")
    gt.add_argument("out_prefix")
    gt.add_argument("--k", type=int, default=10)
    gt.add_argument("--nq", type=int, default=100)
    gt.add_argument("--metric", choices=["cosine", "l2"], default="cosine")

    args = p.parse_args(argv)
    from mini_ivf_ray.config import PipelineConfig

    if args.cmd == "synth":
        from mini_ivf_ray.sources.pages import write_pages_corpus

        write_pages_corpus(args.out_dir, args.docs, seed=args.seed)
        print(json.dumps({"out": args.out_dir, "docs": args.docs}))
        return 0

    if args.cmd == "stats":
        from mini_ivf_ray.state import manifest as mf

        meta = mf.read_index_manifest(args.index_dir)
        print(json.dumps(meta, indent=1) if meta else "not committed")
        return 0 if meta else 1

    owned = _session(args.num_cpus)
    import ray
    import ray.data

    try:
        if args.cmd == "build":
            from mini_ivf_ray.pipelines.build import build_index

            cfg = PipelineConfig(num_partitions=args.partitions)
            meta = build_index(
                lambda: ray.data.read_parquet(args.pages),
                args.index_dir,
                cfg,
                dedup=not args.no_dedup,
            )
            print(json.dumps({"n_docs": meta["n_docs"], **meta["counters"]}))
        elif args.cmd == "append":
            from mini_ivf_ray.pipelines.append import append_index

            cfg = PipelineConfig.from_index(args.index_dir)
            meta = append_index(
                lambda: ray.data.read_parquet(args.pages),
                args.index_dir,
                cfg,
                dedup=not args.no_dedup,
                on_existing="skip" if args.skip_existing else "error",
                mode=args.mode,
            )
            print(json.dumps({"n_docs": meta["n_docs"], **meta["counters"]}))
        elif args.cmd == "delete":
            from mini_ivf_ray.pipelines.maintenance import delete_docs

            out = delete_docs(
                args.index_dir,
                args.doc_ids,
                on_missing="ignore" if args.ignore_missing else "error",
            )
            print(json.dumps(out))
        elif args.cmd == "compact":
            from mini_ivf_ray.pipelines.maintenance import compact_index

            meta = compact_index(args.index_dir)
            print(json.dumps({"n_docs": meta["n_docs"], **meta["counters"]}))
        elif args.cmd == "query":
            from mini_ivf_ray.pipelines.query import BM25Searcher
            from mini_ivf_ray.pipelines.maintenance import deleted_ids

            cfg = PipelineConfig.from_index(args.index_dir, topk=args.topk)
            tomb = deleted_ids(args.index_dir)
            searcher = BM25Searcher(
                args.index_dir, cfg,
                denied_ref=tomb if tomb.size else None,
            )
            for rank, (doc, score) in enumerate(searcher.topk_for_text(args.text)):
                print(json.dumps({"rank": rank, "doc_id": doc, "score": round(score, 6)}))
        elif args.cmd == "groundtruth":
            # reference: toolkits/get_groundtruth.cpp — exhaustive scan,
            # neighbors to .ivecs + scores to .fvecs
            import numpy as np
            import pyarrow.parquet as pqm

            from mini_ivf_ray.pipelines.similarity import brute_force_ann
            from mini_ivf_ray.sources.vectors import write_vecs

            t = pqm.read_table(args.embeddings, columns=["vec_id", "embedding"])
            from mini_ivf_ray.functions.matview import list_to_matrix

            Q = list_to_matrix(t["embedding"], np.float64)[: args.nq]
            qids = t["vec_id"].to_numpy()[: args.nq]
            res = brute_force_ann(
                ray.data.read_parquet(args.embeddings), Q, qids,
                k=args.k, metric=args.metric,
            )
            score_col = "cosine" if args.metric == "cosine" else "dist2"
            nq = res["query_id"].nunique()
            ids = (
                res.sort_values(["query_id", "rank"])["vec_id"]
                .to_numpy().reshape(nq, -1).astype(np.int32)
            )
            scores = (
                res.sort_values(["query_id", "rank"])[score_col]
                .to_numpy().reshape(nq, -1).astype(np.float32)
            )
            write_vecs(args.out_prefix + ".ivecs", ids)
            write_vecs(args.out_prefix + ".fvecs", scores)
            print(json.dumps({
                "neighbors": args.out_prefix + ".ivecs",
                "scores": args.out_prefix + ".fvecs",
                "nq": int(nq), "k": int(args.k), "metric": args.metric,
            }))
    finally:
        if owned:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
