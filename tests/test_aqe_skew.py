"""AQE runtime skew handling: prove the session's adaptive settings
actually split a celebrity-key shuffle partition at runtime (the
automatic complement to the manual salted_join in operators/skew.py).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def skew_confs(spark):
    """Scale AQE's size thresholds down to fixture bytes so a ~18 MB
    hot partition registers as skewed (production defaults are 256 MB
    — the MECHANISM under test is scale-invariant, only the trigger
    sizes move)."""
    keys = [
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    prev = {k: spark.conf.get(k, None) for k in keys}
    spark.conf.set(keys[0], "64KB")
    spark.conf.set(keys[1], "16KB")
    spark.conf.set(keys[2], "-1")  # force sort-merge so skew-split applies
    yield spark
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_celebrity_key(skew_confs):
    spark = skew_confs
    # 90% of 200k left rows share key 0 -> one hot shuffle partition
    left = spark.range(0, 200_000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.lit("dim").alias("v")
    )
    j = left.join(right, "k")
    # act on THIS DataFrame so its AdaptiveSparkPlan finalizes (a
    # count() builds a separate QueryExecution and would show the
    # un-executed plan)
    j.foreach(lambda r: None)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, "AQE did not split the skewed partition"
    assert "skewed" in plan  # AQEShuffleRead marks the split reader
    # correctness unaffected: every non-hot left row matches its dim
    # key; hot key 0 matches too -> 10% distinct ids + 90% hot rows
    assert j.count() == 180_100
