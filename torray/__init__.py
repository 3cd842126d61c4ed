"""torray — a Ray-Data-native crawl-frontier / data-processing engine.

From-scratch re-implementation of the observable semantics of the
TorSpider reference crawler (see SURVEY.md) expressed as Ray Data
pipelines: the "web" is a Parquet table of pages, "fetch" is a
co-partitioned lookup, extraction is an Arrow `map_batches` stage, the
URL-seen set is a pool of sharded stateful actors, and the crawl is a
round-based BFS whose every ordering decision is deterministic.

Public modules:
- ``torray.urlnorm``   — quirk-exact URL normalization / merging
- ``torray.parse``     — title / link / form extraction, hashing, status taxonomy
- ``torray.fetch``     — the simulated-fetch semantics over page rows
- ``torray.extract``   — batched (Arrow) scan of page batches
- ``torray.synth``     — deterministic synthetic web generator
- ``torray.pagestore`` — host-hash-bucketed page index (fetch-as-lookup)
- ``torray.frontier``  — seen-set shard actors + politeness selection
- ``torray.crawl``     — the round loop (checkpointed, resumable)
- ``torray.stats``     — SpiderStats-equivalent analytics
- ``torray.ops``       — training-data operators (dedup, text, similarity, ...)
"""

__version__ = "0.1.0"

# Ray 2.49 hash-shuffle joins crash when a side's first block is empty
# (schema never reaches zero-row partitions); see torray/_rayfix.py.
from torray import _rayfix as _rayfix  # noqa: E402

_rayfix.apply()
