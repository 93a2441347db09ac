"""ray-ndd: Ray-Data-native near-duplicate detection & clustering for
transcript tables.

Importing this package configures the process-local Ray Data context to use
the HASH_SHUFFLE strategy: the engine's keyed-repartition execution pattern
(state/partitioning.py) requires it, and Ray captures the DataContext when a
Dataset is CREATED — so it must be set before any source dataset exists, not
at pipeline-call time.  This does not initialise Ray.
"""

from .state.partitioning import enable_hash_shuffle as _enable_hash_shuffle

_enable_hash_shuffle()
