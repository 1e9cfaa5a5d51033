"""UDF / pandas-UDF / UDTF surface (SURVEY.md §2.3 M3).

The reference has no user-defined functions (host-language Rust only);
this declares the engine's three Python extension points and their
cost model:

  - q_udf_scalar: row-at-a-time Python UDF — the SLOW path (per-row
    serialization through the JVM->Python bridge). Declared for
    completeness; the oracle proves it equals the closed-form SQL that
    should replace it in production plans.
  - q_udf_pandas: Arrow-batched vectorized compute via applyInPandas —
    the sanctioned Python path (10-100x the row UDF).
  - q_udtf_explode: generator semantics via posexplode — fully
    JVM-side; prefer this whenever the logic is expressible.
  - q_udtf_python: the genuine Spark 4 @udtf class for opaque
    stateful-generator logic (ordered-dict vocabulary profile).
  - q_udaf_pandas: grouped-agg pandas UDF (true UDAF) — whole group in
    one series, no partial aggregation; decimal-exact internals.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from fhir2sql_spark.registry import query
from fhir2sql_spark.tables import load
from fhir2sql_spark.queries.util import dec

_Q6 = Decimal("0.000001")


def _charge(price, tax, disc):
    if price is None or tax is None or disc is None:
        return None
    return (price * (1 - disc) * (1 + tax)).quantize(_Q6, rounding=ROUND_HALF_UP)


@query(
    "q_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(8,4)))
                * (1 + CAST(l_tax AS DECIMAL(8,4))) AS DECIMAL(18,6)) AS DOUBLE) AS charge
    FROM lineitem
    WHERE l_orderkey % 20 = 0
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDF charge(price,tax,disc) = price*(1-disc)*(1+tax),
    exact Decimal arithmetic quantized HALF_UP. Input precisions are
    kept small (12,2 / 8,4) so the exact product fits under DuckDB's
    38-digit ceiling, and the output scale (6) covers the product's
    true scale exactly — no downscale rounding anywhere (DuckDB's
    decimal cast TRUNCATES while Spark's rounds, so any lossy cast in
    an oracle is a correctness bug).

    This query is a UDF-surface CONFORMANCE test, deliberately the
    slow path: its oracle is its own closed form, and in production
    this expression belongs in F.expr (JVM-side, whole-stage codegen,
    ~20x faster here) or at least a pandas_udf (q_udf_pandas). Never
    put a row-at-a-time Python UDF in a 100 TB hot path. The input is
    a deterministic 1/20 orderkey slice (r9): conformance needs the
    row-boundary semantics exercised, not the whole fact table pushed
    through the pickle boundary — the full-scan form spent ~5 s of
    suite time re-proving the same property 600 k times."""
    charge_udf = F.udf(_charge, DecimalType(18, 6))
    l = load(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 20 == 0
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        charge_udf(
            F.col("l_extendedprice").cast("decimal(12,2)"),
            F.col("l_tax").cast("decimal(8,4)"),
            F.col("l_discount").cast("decimal(8,4)"),
        ).cast("double").alias("charge"),
    )


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    x = pdf["o_totalprice"]
    mu = x.mean()
    sd = x.std(ddof=0)
    z = (x - mu) / sd if sd > 0 else x * 0.0
    return pd.DataFrame(
        {
            "o_orderkey": pdf["o_orderkey"],
            "o_orderpriority": pdf["o_orderpriority"],
            "z": z.round(4),
        }
    )


@query(
    "q_udf_pandas",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round((o_totalprice - AVG(o_totalprice) OVER w)
                 / STDDEV_POP(o_totalprice) OVER w, 4) AS z
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority)
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized per-group z-score (population stddev) through
    applyInPandas: one Arrow batch per group, numpy compute. Grouping
    key cardinality (5 priorities) is low here; at 100 TB the key
    would need to be a salted composite or the stats pre-aggregated
    (two-pass join), since each group must fit one executor."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .groupBy("o_orderpriority")
        .applyInPandas(_zscore, "o_orderkey long, o_orderpriority string, z double")
    )


@query(
    "q_udtf_explode",
    oracle="""
    WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, toks[CAST(i AS INT)] AS token, CAST(i AS INT) AS pos
    FROM s, range(1, 1001) t(i)
    WHERE i <= len(toks)
    """,
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating semantics: one (doc_id, token, pos) row per
    token, pos 1-based. posexplode is JVM-side generator execution —
    no Python boundary, fully pipelined into downstream operators."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "token")
    ).select("doc_id", "token", (F.col("pos0") + 1).cast("int").alias("pos"))


@query(
    "q_udtf_python",
    oracle="""
    WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    pos AS (
      SELECT doc_id, toks[CAST(i AS INT)] AS token, CAST(i AS INT) AS pos
      FROM s, range(1, 1001) t(i)
      WHERE i <= len(toks)
    )
    SELECT doc_id, token, CAST(MIN(pos) AS INT) AS first_pos,
           COUNT(*) AS n_occurrences
    FROM pos
    GROUP BY doc_id, token
    """,
)
def q_udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine Spark 4 Python UDTF (@udtf class, lateral-joined in
    SQL): per-document vocabulary profile — one row per DISTINCT token
    with its first position (1-based) and occurrence count, built with
    an ordered dict inside the generator. This is the opaque stateful-
    generator shape posexplode can't express; it runs in the Python
    worker per partition with no shuffle (the dict state is per-row,
    not cross-row). The oracle is the relational equivalent
    (explode -> group by token -> min(pos)/count)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, first_pos int, n_occurrences bigint")
    class VocabProfile:
        def eval(self, text: str):
            stats: dict[str, list[int]] = {}
            for i, tok in enumerate(text.split(" "), start=1):
                if tok in stats:
                    stats[tok][1] += 1
                else:
                    stats[tok] = [i, 1]
            for tok, (first, cnt) in stats.items():
                yield tok, first, cnt

    spark.udtf.register("f2s_vocab_profile", VocabProfile)
    load(spark, sf_dir, "documents").createOrReplaceTempView("v_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.first_pos, t.n_occurrences
        FROM v_udtf_docs d, LATERAL f2s_vocab_profile(d.text) t
        """
    )


@query(
    "q_udaf_pandas",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(SUM(CAST(round(CAST(l_extendedprice AS DECIMAL(18,4))
                                    * CAST(l_quantity AS DECIMAL(18,4)), 2)
                              AS DECIMAL(18,2))) AS DOUBLE)
                / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                AS DOUBLE) AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True UDAF: a grouped-agg pandas UDF computing the
    quantity-weighted average price per return flag. Internals are
    exact Decimal sums (inputs carry <=2 dp so Decimal(str(x)) is
    lossless), each product quantized to 2 dp HALF_UP (= both engines'
    ROUND) so every sum's UNSCALED value stays under 2^53 — above
    that, decimal->double conversion double-rounds in DuckDB
    (double(int)/double(10^scale)) while Python's float(Decimal)
    rounds once, and the last ulp diverges (observed before this
    quantize). Exact sums -> exact float conversions -> one IEEE
    divide: bit-identical at any pandas iteration order. Scale note:
    grouped-agg pandas UDFs receive the WHOLE group as one in-memory
    series (no partial aggregation) — built-in decimal sums are the
    hot-path form; this exists for logic no builtin expresses."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    _Q2 = Decimal("0.01")

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        num = Decimal(0)
        den = Decimal(0)
        for p, q in zip(price, qty):
            dp, dq = Decimal(str(p)), Decimal(str(q))
            num += (dp * dq).quantize(_Q2, rounding=ROUND_HALF_UP)
            den += dq
        return float(num) / float(den)

    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        wavg("l_extendedprice", "l_quantity").alias("wavg_price")
    )
