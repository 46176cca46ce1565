"""Data streams with rollover — Elasticsearch's data stream + ILM
``rollover`` API: an append-only stream of immutable backing
generations, writes always landing in the newest generation until a
rollover condition seals it, reads spanning every generation as one
logical index.

Pinned semantics (ES's):

  * ``append_datastream`` writes the batch into the HEAD generation
    (``append_index`` incremental path — cost ∝ increment); the
    rollover condition (``max_docs_per_gen``, ES ``max_docs``) is
    checked AFTER the write — the generation that crossed the
    threshold keeps its oversized tail and the NEXT append opens a
    fresh generation, exactly how ES rollover trails its condition;
  * generations are immutable once sealed; the head additionally
    honors ``append_index``'s auto-compaction policy so a
    long-running head never accumulates unbounded epochs;
  * reads (``datastream_search``) run the federated multi-index DFS
    plan (pipelines/federated.py): a pre-query statistics exchange
    combines per-generation term stats and each generation scores its
    own postings under the GLOBAL values — the merged ranking is
    bit-identical to one index over the whole stream (the dfs_multi
    pin), so rollover is invisible to ranking;
  * stream state is one small JSON (generation list + head-sealed
    flag), committed atomically (tmp + rename — the manifest.py
    convention); a torn writer leaves the previous state visible.

Doc ids must be globally unique across the stream (the federated
disjoint-corpus contract — violations are detected and refused at
query time by dfs_multi_search's overlap check).

Scale shape: every generation is an ordinary index (partitioned,
resumable, incrementally appendable); rollover bounds per-generation
size so compaction cost and epoch counts stay bounded regardless of
stream length, and the read path's statistics exchange is
(generations x vocab)-sized, never corpus-sized.
"""

from __future__ import annotations

import json
import os
import tempfile

import pandas as pd

from mini_ivf_ray.config import PipelineConfig

STREAM_FILE = "stream.json"


def _state_path(ds_dir: str) -> str:
    return os.path.join(ds_dir, STREAM_FILE)


def _load_state(ds_dir: str) -> dict:
    with open(_state_path(ds_dir)) as f:
        return json.load(f)


def _commit_state(ds_dir: str, state: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=ds_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _state_path(ds_dir))


def create_datastream(ds_dir: str) -> None:
    """Initialise an empty stream (refuses to clobber an existing
    one)."""
    os.makedirs(ds_dir, exist_ok=True)
    if os.path.exists(_state_path(ds_dir)):
        raise FileExistsError(f"data stream already exists: {ds_dir}")
    _commit_state(ds_dir, {"generations": [], "head_sealed": False})


def datastream_generations(ds_dir: str) -> list[str]:
    """Absolute backing-index dirs, oldest first."""
    st = _load_state(ds_dir)
    return [os.path.join(ds_dir, g) for g in st["generations"]]


def _head_n_docs(gen_dir: str) -> int:
    from mini_ivf_ray.state.stats import CorpusStats

    return int(CorpusStats.load(gen_dir).n_docs)


def append_datastream(
    ds_dir: str,
    pages_factory,
    cfg: PipelineConfig,
    max_docs_per_gen: int,
    auto_compact_epochs: int | None = None,
) -> dict:
    """Write one batch into the stream under the rollover policy.
    Returns {'generation': name, 'rolled': bool, 'n_docs': head count
    after the write}."""
    if max_docs_per_gen < 1:
        raise ValueError(
            f"max_docs_per_gen must be >= 1, got {max_docs_per_gen}"
        )
    from mini_ivf_ray.pipelines.append import append_index
    from mini_ivf_ray.pipelines.build import build_index

    st = _load_state(ds_dir)
    gens = st["generations"]
    open_head = gens and not st["head_sealed"]
    if open_head:
        gen = gens[-1]
        append_index(
            pages_factory,
            os.path.join(ds_dir, gen),
            cfg,
            dedup=False,
            auto_compact_epochs=auto_compact_epochs,
        )
    else:
        gen = f"gen-{len(gens) + 1:06d}"
        build_index(
            pages_factory, os.path.join(ds_dir, gen), cfg, dedup=False
        )
        st["generations"] = gens = gens + [gen]
        st["head_sealed"] = False
    n = _head_n_docs(os.path.join(ds_dir, gen))
    rolled = n >= max_docs_per_gen
    if rolled:
        # ES rollover: the condition trails the write — this
        # generation keeps its oversized tail and is sealed; the NEXT
        # append opens a fresh one
        st["head_sealed"] = True
    _commit_state(ds_dir, st)
    return {"generation": gen, "rolled": bool(rolled), "n_docs": n}


def datastream_search(
    ds_dir: str,
    queries: list[tuple[int, str]],
    cfg: PipelineConfig | None = None,
    dfs: bool = True,
) -> pd.DataFrame:
    """BM25 top-k over the whole stream — the federated DFS plan over
    every generation (bit-identical to a single union index)."""
    from mini_ivf_ray.pipelines.federated import dfs_multi_search

    gens = datastream_generations(ds_dir)
    if not gens:
        raise ValueError(f"data stream has no generations: {ds_dir}")
    cfg = cfg if cfg is not None else PipelineConfig.from_index(gens[0])
    return dfs_multi_search(gens, queries, cfg, dfs=dfs)
