"""dedupe_ray — a from-scratch Ray-Data-native entity-resolution / data-processing engine.

Re-creates the query and data-processing capabilities of the reference
(muham-2002/dedupe, see /root/repo/SURVEY.md) as idiomatic Ray Data pipelines:

- ``ray.data.Dataset`` end to end; all hot stages are ``map_batches`` over
  zero-copy Arrow batches.
- Stateful stages (trained scorer, TF-IDF index) are actor pools.
- Wide steps (blocking, pair dedup, connected components, cluster stats) are
  ``groupby`` / ``aggregate`` shuffles with explicit skew handling.

Nothing in this package calls ``ray.init()`` — the driver owns the session.
"""

from dedupe_ray.config import EngineConfig, FieldConfig
from dedupe_ray.predicates import register_predicate

__all__ = ["EngineConfig", "FieldConfig", "register_predicate"]
__version__ = "0.1.0"
