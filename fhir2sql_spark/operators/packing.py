"""Sequence packing and shard balancing for training-data export.

Two operators a 100 TB pretraining pipeline needs between "corpus is
curated" and "tokens hit the trainer":

  - ``pack_greedy``: greedy sequential packing of documents into
    context-window-sized bins (capacity in tokens). Packing is
    inherently a sequential fold over an ordered stream, so it runs as
    ``applyInPandas`` per stream key (here ``lang``) — each stream's
    docs arrive as one Arrow batch, the fold is O(stream) in pandas.
    At 100 TB the stream key must be a composite (e.g. lang x shard)
    so no single group exceeds executor memory; packing quality is
    unaffected because bins never cross stream keys anyway.

  - ``shard_assign``: deterministic balanced sharding by serpentine
    (boustrophedon) rank assignment — sort docs by token count
    descending, deal ranks 0..N-1 forward then N-1..0 backward, so
    every shard gets one doc from each "size band". Deterministic
    (tie-broken by doc_id), reproducible, and within one band of
    optimal for LPT-style balancing. The global row_number here is a
    single-task window at local scale; the 100 TB form computes the
    same rank distributively (sort -> per-partition counts -> offset
    add, the same pattern as sync/pipeline.py pk allocation).

The reference (samply/fhir2sql) has no counterpart; these exist for
the LLM-pipeline surface (BASELINE.json north star).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PACKED_SCHEMA = "doc_id long, lang string, n_tokens int, bin_id int"


def _pack_stream(pdf: pd.DataFrame, capacity: int) -> pd.DataFrame:
    """Greedy fold: docs in doc_id order; open a new bin when the
    running total would exceed capacity. An oversized doc (> capacity
    alone) occupies its own bin. Matches the recursive-CTE oracle
    exactly: first doc -> bin 0 with acc = its tokens."""
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    bins, acc, bin_id = [], 0, 0
    for i, tok in enumerate(pdf["n_tokens"]):
        if i > 0 and acc + tok > capacity:
            bin_id += 1
            acc = tok
        else:
            acc += tok
        bins.append(bin_id)
    pdf["bin_id"] = pd.Series(bins, dtype="int32")
    return pdf[["doc_id", "lang", "n_tokens", "bin_id"]]


def _pack_stream_bfd(pdf: pd.DataFrame, capacity: int) -> pd.DataFrame:
    """Best-fit-decreasing fold: docs sorted by (n_tokens DESC,
    doc_id); each doc goes to the FULLEST bin it still fits (tie:
    lowest bin id — the first max), else opens a new bin. An
    oversized doc occupies its own (never-reusable) bin. Matches the
    list-state recursive-CTE oracle exactly: list_position picks the
    first occurrence of the max fitting load, the same tie-break."""
    pdf = pdf.sort_values(
        ["n_tokens", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    loads: list[int] = []
    bins: list[int] = []
    for tok in pdf["n_tokens"]:
        best, best_load = -1, -1
        for i, ld in enumerate(loads):
            if ld + tok <= capacity and ld > best_load:
                best, best_load = i, ld
        if best < 0:
            loads.append(int(tok))
            bins.append(len(loads) - 1)
        else:
            loads[best] += int(tok)
            bins.append(best)
    pdf["bin_id"] = pd.Series(bins, dtype="int32")
    return pdf[["doc_id", "lang", "n_tokens", "bin_id"]]


def pack_bfd(
    docs: DataFrame,
    capacity: int = 256,
    stream_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Best-fit-decreasing packing per stream key — the
    quality-optimized twin of ``pack_greedy`` (BFD is the classical
    11/9·OPT + 6/9 bin-packing approximation vs greedy
    next-fit's 2·OPT): same Arrow fold shape, same composite-stream
    scaling note, O(docs x bins) per stream in pandas (bins ~
    docs/bin-fill, so effectively O(docs^2/cap) worst case — shard
    the stream key before groups approach executor memory anyway)."""
    sized = docs.select(
        "doc_id",
        F.col(stream_col).alias("lang"),
        F.size(F.split(F.col(text_col), " ")).cast("int").alias("n_tokens"),
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _pack_stream_bfd(pdf, capacity)

    return sized.groupBy("lang").applyInPandas(fn, PACKED_SCHEMA)


def pack_greedy(
    docs: DataFrame,
    capacity: int = 256,
    stream_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Pack documents into token bins of ``capacity`` per stream key.

    Token counts are whitespace counts (JVM-side) so only (id, key,
    int) rows cross the Arrow boundary — never the text itself."""
    sized = docs.select(
        "doc_id",
        F.col(stream_col).alias("lang"),
        F.size(F.split(F.col(text_col), " ")).cast("int").alias("n_tokens"),
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _pack_stream(pdf, capacity)

    return sized.groupBy("lang").applyInPandas(fn, PACKED_SCHEMA)


def _ranged_by(df: DataFrame, order_exprs: list, n_parts: int | None):
    """Range-repartition for the rank / prefix-sum family, returning
    (ranged_df_with___pid, pid_bound).

    r11 made the default SCALE-ADAPTIVE — a number-free
    repartitionByRange whose width AQE sizes by advisory bytes (guide
    §2: partitions sized by data, not a constant). r12 (ADVICE r11
    high): a number-free user repartition takes
    ``conf.numShufflePartitions``, which resolves to
    ``coalescePartitions.initialPartitionNum`` (512 here) when AQE
    coalescing is enabled (SPARK-31220) — NOT shuffle.partitions — so
    the r11 bound (shuffle.partitions) under-counted the planned
    width and silently dropped every offset past partition 31
    (reproduced: 512 post-AQE partitions -> 313 distinct ranks out of
    5000; tests/test_curation.py pins the regime). The bound now
    comes from ``_planned_width`` (the conf that actually sizes the
    plan), and ``_prefix_offsets`` degrades to a bound-free form when
    the bound is too large for the explode.

    Both consumers (the counts aggregate and the final join) read the
    SAME shuffle stage: AQE reuses the materialized exchange (the
    subtree is byte-identical) and CoalesceShufflePartitions is a
    deterministic function of that one stage's map-output statistics
    plus session-constant sizes, so every read sees the identical
    post-coalesce partitioning and ``spark_partition_id()`` agrees
    across branches. (A localCheckpoint pin would enforce this
    structurally but measured 1.5-2x slower across the six rank-family
    queries — the recompute of the cheap lineage beats a DISK_ONLY
    write+read; tests/test_curation.py pins rank correctness under a
    forced 512-partition no-coalesce regime either way.)

    Output ranks/sums stay partition-count-invariant: callers order by
    total orders and sum integers."""
    if n_parts is None:
        bound = _planned_width(df)
        if bound is None:
            # unparsable session conf (e.g. a vendor "auto"): force an
            # explicit width so the bound is true by construction
            bound = 32
            ranged = df.repartitionByRange(bound, *order_exprs)
        else:
            ranged = df.repartitionByRange(*order_exprs)
    else:
        bound = n_parts
        ranged = df.repartitionByRange(n_parts, *order_exprs)
    return ranged.withColumn("__pid", F.spark_partition_id()), bound


def _planned_width(df: DataFrame):
    """The width Spark will PLAN for a number-free user repartition:
    ``conf.numShufflePartitions``, which is
    ``coalescePartitions.initialPartitionNum`` when AQE partition
    coalescing is enabled (SPARK-31220) and ``shuffle.partitions``
    otherwise. AQE can only COALESCE a plain repartition's read below
    this (splitting happens only for skew-join / rebalance nodes), so
    every possible ``spark_partition_id()`` is < the returned value.
    Returns None when the session carries unparsable values —
    correctness never depends on the conf parse (callers then force an
    explicit width instead). The r11 form read ``shuffle.partitions``
    unconditionally, which under-counted 512-wide plans and silently
    dropped every offset past partition 31 (ADVICE r11 high)."""
    conf = df.sparkSession.conf

    def geti(key):
        try:
            v = conf.get(key)
            return int(v) if v is not None else None
        except Exception:  # noqa: BLE001 — unset/unparsable both land here
            return None

    base = geti("spark.sql.shuffle.partitions")
    if base is None:
        return None
    try:
        aqe_coalesce = (
            conf.get("spark.sql.adaptive.enabled", "true") == "true"
            and conf.get(
                "spark.sql.adaptive.coalescePartitions.enabled", "true"
            )
            == "true"
        )
    except Exception:  # noqa: BLE001
        aqe_coalesce = True  # conservative: assume the larger width
    if aqe_coalesce:
        init = geti(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
        )
        if init is not None:
            return max(base, init)
    return base


def _prefix_offsets(
    per_pid: DataFrame, val_cols: list, out_cols: list, bound: int
) -> DataFrame:
    """Strict-prefix totals of the tiny per-partition table: the
    offset of partition p = sum of each value over partitions < p
    (0 when none). ``bound`` is a PROVEN upper bound on __pid + 1
    (_planned_width — the r11 shape read shuffle.partitions here,
    which under-counts 512-wide AQE plans: ADVICE r11 high).

    Primary form: the r6 explode-to-successors equi-aggregation —
    O(P x bound) tiny rows, measured the fastest of three candidates
    at fixture scale (a non-equi self-join costs an extra broadcast +
    BNLJ per consumer, +0.4-0.7 s/rank call; a single-task cumulative
    window serializes 3-4 extra AQE stage round-trips per consumer,
    +5-10 s on the 3-consumer queries). Above 4096 planned partitions
    the explode's bound^2 row count stops being tiny, so the
    bound-free single-task window takes over — P rows are single-digit
    MB even at a 10^6-partition 100 TB posture, and at that scale the
    fixed stage overhead is noise."""
    if bound > 4096:
        w = Window.orderBy("__pid").rowsBetween(
            Window.unboundedPreceding, -1
        )
        return per_pid.select(
            "__pid",
            *[
                F.coalesce(F.sum(v).over(w), F.lit(0)).alias(o)
                for v, o in zip(val_cols, out_cols)
            ],
        )
    contrib = (
        per_pid.where(F.col("__pid") < bound - 1)
        .select(
            F.explode(
                F.sequence(F.col("__pid") + 1, F.lit(bound - 1))
            ).alias("__pid"),
            *val_cols,
        )
        .groupBy("__pid")
        .agg(
            *[
                F.sum(v).alias(f"__c{i}")
                for i, v in enumerate(val_cols)
            ]
        )
    )
    return (
        per_pid.select("__pid")
        .join(contrib, "__pid", "left")
        .select(
            "__pid",
            *[
                F.coalesce(F.col(f"__c{i}"), F.lit(0)).alias(o)
                for i, o in enumerate(out_cols)
            ],
        )
    )


def distributed_rank(
    df: DataFrame,
    order_exprs: list,
    n_parts: int | None = None,
    out_col: str = "rnk",
) -> DataFrame:
    """0-based dense global rank without a single-task window.

    Window.orderBy() with no partition moves ALL rows to one task —
    fine at fixture scale, fatal at 100 TB. This is the distributed
    form (same pattern as sync/pipeline.py's pk allocation):
    range-repartition on the sort key so partition i holds the i-th
    key range, rank within each partition (parallel windows), then add
    per-partition offsets computed from the (tiny, bound-row) count
    table. Output ranks are identical to the global window's — and
    identical for ANY partition count, because callers rank by total
    orders (ties would already be nondeterministic under the fixed-32
    form otherwise)."""
    ranged, bound = _ranged_by(df, order_exprs, n_parts)
    counts = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    # Prefix offsets with a PROVEN width bound (see _prefix_offsets /
    # _planned_width — the r6 explode form's static bound broke when
    # the number-free repartition planned wider than it, ADVICE r11
    # high).
    offsets = _prefix_offsets(counts, ["__cnt"], ["__off"], bound)
    w_in = Window.partitionBy("__pid").orderBy(*order_exprs)
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.row_number().over(w_in) - 1 + F.col("__off"))
        .drop("__pid", "__off")
    )


def shard_assign(
    docs: DataFrame,
    n_shards: int = 8,
    text_col: str = "text",
    distributed: bool = False,
) -> DataFrame:
    """Serpentine shard assignment: rank docs by (n_tokens DESC,
    doc_id), shard = pos on even passes, N-1-pos on odd passes.

    ``distributed=True`` ranks via distributed_rank (the 100 TB form);
    the default global window is kept for oracle-parity plans. Both
    produce identical output (property-tested)."""
    sized = docs.select(
        "doc_id",
        F.size(F.split(F.col(text_col), " ")).cast("int").alias("n_tokens"),
    )
    order = [F.desc("n_tokens"), F.asc("doc_id")]
    if distributed:
        ranked = distributed_rank(sized, order)
    else:
        ranked = sized.withColumn("rnk", F.row_number().over(Window.orderBy(*order)) - 1)
    pas = (F.col("rnk") / n_shards).cast("int")
    pos = F.pmod(F.col("rnk"), F.lit(n_shards))
    shard = F.when(pas % 2 == 0, pos).otherwise(n_shards - 1 - pos)
    return ranked.select(
        "doc_id", "n_tokens", shard.cast("int").alias("shard")
    )


def distributed_prefix_sum(
    df: DataFrame,
    order_exprs: list,
    value_col: str | list[str],
    out_col: str | list[str] = "csum",
    n_parts: int | None = None,
) -> DataFrame:
    """Global inclusive running sum of each ``value_col`` in
    ``order_exprs`` order without a single-task window — the cumsum
    twin of distributed_rank above (same shape: range-repartition on
    the sort key, per-partition running sums in parallel, then add
    offsets from the tiny per-partition total table; n_parts=None is
    the scale-adaptive default, see _ranged_by). Value columns are
    INTEGER by contract (exact under any partitioning — a float sum
    would drift with the partition count). Multiple value columns
    share the ONE repartition, offset table and per-partition sort (a
    second call would pay all three again)."""
    vals = [value_col] if isinstance(value_col, str) else list(value_col)
    outs = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(vals) != len(outs):
        raise ValueError(f"{len(vals)} value cols vs {len(outs)} out cols")
    ranged, bound = _ranged_by(df, order_exprs, n_parts)
    sums = ranged.groupBy("__pid").agg(
        *[F.sum(v).alias(f"__s{i}") for i, v in enumerate(vals)]
    )
    # prefix aggregation under the PROVEN width bound (see
    # _prefix_offsets / ADVICE r11 high): every value column's offsets
    # ride the one explode + equi-aggregation.
    offsets = _prefix_offsets(
        sums,
        [f"__s{i}" for i in range(len(vals))],
        [f"__off{i}" for i in range(len(vals))],
        bound,
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = ranged.join(F.broadcast(offsets), "__pid")
    for i, (v, o) in enumerate(zip(vals, outs)):
        joined = joined.withColumn(
            o, F.sum(v).over(w_in) + F.col(f"__off{i}")
        )
    return joined.drop("__pid", *[f"__off{i}" for i in range(len(vals))])
