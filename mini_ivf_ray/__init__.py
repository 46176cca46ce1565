"""mini_ivf_ray — a Ray-Data-native fulltext inverted-index + BM25 engine.

A from-scratch rebuild of the posting-list architecture of
``lcj2021/mini-ivf`` (IVF/IVF-PQ approximate nearest neighbour search,
see /root/reference) re-expressed as a fulltext engine over
Common-Crawl-style Parquet web pages:

* coarse k-means partitions            -> term hash partitions
* posting lists of row ids             -> per-term postings (doc_id, tf, dl)
* packed PQ code payloads              -> delta+varint-compressed posting blocks
* codebook training (``Train``)        -> corpus-statistics pass (N, avgdl, df)
* asymmetric-distance table scoring    -> BM25 (k1=1.2, b=0.75)
* nprobe top-W scan + partial_sort     -> block-max WAND top-k min-heap
* per-cluster shard files + lens       -> per-partition segments + manifests
* recall@k vs exhaustive ground truth  -> rank-identical top-k vs exact BM25

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, ``groupby`` for the one big
shuffle (postings -> partitions), actor pools for stateful query serving.
The library never calls ``ray.init``; sessions are owned by the caller.
"""

from mini_ivf_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
