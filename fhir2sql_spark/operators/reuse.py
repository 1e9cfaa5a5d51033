"""Serialized reuse barriers for multi-consumer intermediate frames.

Catalyst expands every DataFrame reference into its full subtree, and
ReuseExchange only collapses *identical* exchange subtrees — a frame
consumed through differently-keyed or differently-projected branches
is re-derived once per branch. For cheap projections that is free;
for a derivation that already paid a shuffle (co-occurrence edge
lists) or an interpreted HOF pass (lattice quantization) it multiplies
the dominant cost by the consumer count (r11 measurements: 19.8 s
executor CPU for q_graph_jaccard's 4-6 edge re-derivations, 21-29 s
per trained-lattice query).

``materialize_serialized`` is the repo-wide barrier for FACT-SIZED
frames: a lazy ``localCheckpoint`` at ``StorageLevel.DISK_ONLY`` —

- serialized on disk, never a deserialized heap pin (the PLANS.md
  fact-size discipline; the eager MEMORY_AND_DISK default is reserved
  for vocabulary-sized frames);
- lazy: materialized by the query's own first action, so nothing runs
  at plan-build time;
- NOT registered in the CacheManager (unlike ``persist``), so two
  bench queries with byte-identical sub-plans can never silently
  share results — every timed run stays a self-contained computation;
- lineage-truncating, which also keeps iterative consumers' plans
  O(1) (the components/pagerank pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def materialize_serialized(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
