"""deduce_ray — a Ray-Data-native knowledge-graph construction engine.

Re-expresses the rule-based Dutch PHI pipeline of the reference system
(vmenger/deduce 3.0.6, studied at /root/reference) as distributed triple
extraction over Parquet tables of documents / source repositories:

    ray.data.read_parquet(...)
      -> map_batches(stateless doc-id/sha256 projection)          [tasks]
      -> map_batches(AnnotateBatch actor pool, Arrow zero-copy)   [actors]
      -> flat triple table (subj=doc_id, pred=tag, obj=mention)
      -> groupby/canonicalize/dedup                               [shuffle]
      -> write_parquet partitioned by (repo, lang)

The single-document engine in this package is written from scratch against
the reference's *observable semantics* (its pytest corpus is replayed in
``tests/``); no code is copied.
"""

__version__ = "0.1.0"

from deduce_ray.annotation import Annotation, AnnotationSet
from deduce_ray.engine import DeduceEngine
from deduce_ray.person import Person

# familiar alias for users of the reference API (`Deduce().deidentify(...)`)
Deduce = DeduceEngine

__all__ = [
    "Annotation",
    "AnnotationSet",
    "Deduce",
    "DeduceEngine",
    "Person",
    "__version__",
]
