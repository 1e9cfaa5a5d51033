"""Training-corpus export sink — the last stage of the curation
pipeline (after q_corpus_carve / q_pack_sequences / q_shard_balance):
write shard-partitioned parquet or JSONL with bounded file sizes and a
deterministic layout a downstream trainer can consume shard-by-shard.

Scale posture: `repartition(shard_col)` gives each output shard to the
tasks that own its rows (one shuffle keyed on the shard id — the same
exchange q_shard_balance already planned), `sortWithinPartitions`
makes file contents deterministic given the shard assignment, and
`maxRecordsPerFile` bounds every file without a per-file driver loop —
the writer splits task output server-side, so a 100 TB corpus exports
with the same code path. No collect, no driver-side iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard",
    fmt: str = "parquet",
    max_records_per_file: int = 0,
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Write ``df`` under ``path`` partitioned by ``shard_col``
    (one ``{shard_col}=N/`` directory per shard).

    fmt: 'parquet' (columnar, splittable) or 'json' (JSON Lines —
    Spark's json writer emits one object per line, the standard
    training-data interchange format).
    max_records_per_file: >0 caps rows per output file (streamed
    rotation inside each task, not a driver loop).
    sort_cols: deterministic within-file row order.
    """
    if fmt not in ("parquet", "json"):
        raise ValueError(f"fmt must be 'parquet' or 'json', got {fmt!r}")
    out = df.repartition(F.col(shard_col))
    if sort_cols:
        out = out.sortWithinPartitions(shard_col, *sort_cols)
    writer = out.write.mode("overwrite").partitionBy(shard_col)
    if max_records_per_file > 0:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    getattr(writer, fmt)(path)
