"""Z-order layout: bit-interleave correctness vs a pure-Python
reference, and the actual payoff — writing clustered by zkey shrinks
per-file min/max spans on BOTH dimensions (what parquet row-group
pruning feeds on)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from fhir2sql_spark.operators.layout import morton_key
from fhir2sql_spark.registry import QUERIES, load_all
from fhir2sql_spark.tables import load

load_all()


def _py_morton(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z


def test_matches_python_reference(spark, sf_dir):
    rows = QUERIES["q_layout_zorder"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.zkey == _py_morton(r.x, r.y)


def test_bijective_on_domain(spark):
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).cast("long").alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    out = df.withColumn("z", morton_key("x", "y", 6))
    assert out.select("z").distinct().count() == 4096


def test_clustered_write_shrinks_minmax_spans(spark, sf_dir, tmp_path):
    # both dims need a wide domain for span-shrink to be visible
    # (l_suppkey spans only 0..9 at sf0.001, so the query's y column
    # cannot shrink there; the layout effect is dimension-generic)
    l = load(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).cast("long").alias("x"),
        (F.col("l_orderkey") % 256).cast("long").alias("y"),
    )
    z = l.withColumn("zkey", morton_key("x", "y", 8))

    clustered = str(tmp_path / "clustered")
    baseline = str(tmp_path / "baseline")
    # 16 range partitions ~ the top 4 interleaved bits (x7,y7,x6,y6):
    # each file covers a ~64x128 tile of the 256x256 plane (range
    # boundaries are sampled quantiles, so tiles straddle a little)
    (
        z.repartitionByRange(16, "zkey")
        .sortWithinPartitions("zkey")
        .write.parquet(clustered)
    )
    z.repartition(16).write.parquet(baseline)

    def mean_span(path: str, col: str) -> float:
        spans = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                spans.append(st.max - st.min)
        assert spans
        return sum(spans) / len(spans)

    for col in ("x", "y"):
        assert mean_span(clustered, col) < 0.75 * mean_span(baseline, col), (
            f"z-order clustering did not shrink {col} min/max spans"
        )
