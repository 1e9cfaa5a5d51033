"""TPC-H-shaped analytical suite (§2.4 additions, q_tpch_*).

The reference (samply/fhir2sql) computes only COUNT(*)
(/root/reference/src/main.rs:141-148); these queries declare the
multi-join decision-support surface a user switching a warehouse
workload onto this engine expects, in the canonical TPC-H shapes —
adapted to the driver's star schema (TESTDATA.md has no partsupp
table and no l_commitdate/l_receiptdate/l_shipmode/c_phone columns:
Q9/Q15/Q16/Q17/Q20 are adapted with lineitem standing in for
partsupp, Q4/Q12/Q19/Q21/Q22 substitute equivalent predicates over
existing columns, and Q2/Q11 run over a deterministic partsupp
DERIVED from part x supplier on both oracle sides — see _PS_CTES at
the bottom of this module). With those plus q_tpch_q1 (round 5: the
full canonical measure set; the flagship q_agg_basic carries the
same shape with fewer measures), all 22 canon queries are
registered.

Determinism (SURVEY.md §2.3 rules): DECIMAL(18,4) casts before any
SUM, exact-decimal-sum -> IEEE-double division for every ratio,
unique-key tie-breaks under every LIMIT, DATE casts on emitted
timestamps, explicit output column names on both sides.

Physical-plan notes at scale (verified with .explain at sf0.1):
  - every dim join (nation/region/part/customer-after-filter) is a
    BroadcastHashJoin: the lineitem fact side never shuffles for them;
  - fact-fact joins (orders x lineitem) sort-merge on the join key and
    AQE re-plans to broadcast when a filtered side collapses;
  - Q18's HAVING-over-groupBy is a partial+final hash aggregate whose
    shuffle carries one row per orderkey, then a semi-join back —
    lineitem is never shuffled twice;
  - the date filters reach the parquet scan (PushedFilters), so at
    100 TB with date-partitioned storage they become partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir2sql_spark.registry import query
from fhir2sql_spark.tables import load
from fhir2sql_spark.queries.util import dec, exact_div

# Exact decimal revenue term used by most TPC-H queries:
# l_extendedprice * (1 - l_discount), all in DECIMAL(18,4).
_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"


def _rev() -> F.Column:
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))


@query(
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                    * (1 - CAST(l_discount AS DECIMAL(8,4)))
                    * (1 + CAST(l_tax AS DECIMAL(8,4)))), 4) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                / COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                / COUNT(*) AS DOUBLE) AS avg_price,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
                / COUNT(*) AS DOUBLE) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary report — the full canonical measure set
    (q_agg_basic, the flagship, carries the Q1 shape with a reduced
    measure list; this registers the literal canon query so all 22
    TPC-H queries exist under their own names). One scan + pushed
    date filter + single partial+final hash aggregate over a 4-group
    key; every measure is a mergeable decimal sum or an exact
    decimal-sum/count ratio (exact_div), so the plan is map-side
    combine + a 4-row exchange regardless of scale.

    sum_charge's three-factor product uses NARROW casts — price
    DECIMAL(12,4), rates DECIMAL(8,4) — so the product type (30,12)
    keeps every digit: at (18,4) width the second multiply overflows
    precision 38 and each engine truncates scale by its own rule
    (observed: last-digit drift at sf0.01; same fix as q_udf_scalar's
    charge). The 4-dp reduction is an explicit ROUND, never a decimal
    DOWNCAST: Spark rounds a narrowing decimal cast HALF_UP but DuckDB
    TRUNCATES it — invisible in the suite's (price × rate) sums, whose
    cents×cents products carry only 4 real decimals, but the 6-decimal
    charge exposed it. ROUND is half-away-from-zero in both engines
    (values positive, so HALF_UP agrees)."""
    l = load(spark, sf_dir, "lineitem")
    qty = dec("l_quantity")
    price = dec("l_extendedprice")
    disc_price = price * (F.lit(1) - dec("l_discount"))
    charge = (
        F.col("l_extendedprice").cast("decimal(12,4)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(8,4)"))
        * (F.lit(1) + F.col("l_tax").cast("decimal(8,4)"))
    )
    n = F.count(F.lit(1))
    return (
        l.where(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("decimal(18,4)").cast("double").alias("sum_qty"),
            F.sum(price).cast("decimal(18,4)").cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(18,4)").cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 4).cast("double").alias("sum_charge"),
            exact_div(F.sum(qty), n).alias("avg_qty"),
            exact_div(F.sum(price), n).alias("avg_price"),
            exact_div(F.sum(dec("l_discount")), n).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           o_orderdate AS o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: filtered 3-way join, revenue top-10.

    The filtered customer side broadcasts (AQE); lineitem never
    shuffles for it. TakeOrderedAndProject caps the sort at k rows per
    partition."""
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-01-01")
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1998-01-01")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_rev()).cast("decimal(18,4)").cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking — EXISTS as a left-semi join with a
    non-equi residual (shipped >60 days after order; the testdata has
    no l_commitdate/l_receiptdate, so late shipment substitutes)."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    l = load(spark, sf_dir, "lineitem")
    cond = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q_tpch_q5",
    oracle=f"""
    SELECT n_name,
           CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: 6-way join with the classic
    customer-nation = supplier-nation co-location predicate. nation
    and region broadcast; the c_nationkey = s_nationkey residual rides
    the supplier equi-join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_rev()).cast("decimal(18,4)").cast("double").alias("revenue"))
    )


@query(
    "q_tpch_q6",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast revenue change: pure scan + pushed filter + one
    global agg — the all-pushdown baseline (zero joins, one shuffle of
    one partial row per partition)."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("decimal(18,4)")
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q_tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
           CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping between two nations — self-joined nation dim
    under two aliases, disjunctive pair predicate, per-year rollup."""
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").alias("n1")
    n2 = load(spark, sf_dir, "nation").alias("n2")
    j = (
        s.join(l, s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2.n_nationkey"))
        .where(
            ((F.col("n1.n_name") == "NATION_3") & (F.col("n2.n_name") == "NATION_7"))
            | ((F.col("n1.n_name") == "NATION_7") & (F.col("n2.n_name") == "NATION_3"))
        )
    )
    return (
        j.select(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
            _rev().alias("rev"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev").cast("decimal(18,4)").cast("double").alias("revenue"))
    )


@query(
    "q_tpch_q8",
    oracle=f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             CAST({_REV_SQL} AS DECIMAL(18,4)) AS volume,
             n_name AS nation
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_type = 'ECONOMY'
    ) t
    GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 market share of one supplier nation per order-year for one
    part type. Ratio = exact decimal sums -> IEEE double divide
    (bit-identical across engines and partition orders)."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    vol = _rev().cast("decimal(18,4)")
    t = (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("n_name").alias("nation"),
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return t.groupBy("o_year").agg(
        exact_div(
            F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(zero)),
            F.sum("volume"),
        ).alias("mkt_share")
    )


@query(
    "q_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: top-20 customers by lost revenue in
    a quarter. Group keys include the customer attributes so no
    re-join after the aggregate."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    l = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("decimal(18,4)").cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-mode priority counts (l_linestatus substitutes for
    the absent l_shipmode): pivot-style conditional counts in one
    aggregate pass."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) t
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution: outer join with an extra
    join-condition filter (not a WHERE — null-extended rows survive),
    then a second aggregation over the first's output."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT")
    return (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "q_tpch_q14",
    oracle=f"""
    SELECT CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE) AS promo_revenue,
           CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(18,4)) AS DOUBLE) AS total_revenue,
           CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                / CAST(SUM({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS promo_share
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-02-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect: broadcast part join + conditional revenue
    share in one aggregate (no second pass for the denominator)."""
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-02-01")
    )
    p = load(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(18,4)")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .agg(
            F.sum(promo).cast("decimal(18,4)").cast("double").alias("promo_revenue"),
            F.sum(_rev()).cast("decimal(18,4)").cast("double").alias("total_revenue"),
            exact_div(F.sum(promo), F.sum(_rev())).alias("promo_share"),
        )
    )


@query(
    "q_tpch_q18",
    oracle="""
    SELECT c_custkey, o_orderkey,
           o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: aggregate lineitem per order FIRST,
    apply the HAVING threshold on the 1-row-per-orderkey aggregate,
    and only then join orders and customer — the selective filter
    (few orders clear 150 total quantity) shrinks both joins to a
    broadcast-able survivor set, so neither orders nor customer ever
    shuffles for a row that cannot reach the output. Joining before
    aggregating (the literal SQL order) shuffles all of lineitem
    joined against orders x customer; A/B at sf100: 66.6 s -> 36.4 s,
    identical top-100 (SCALE.md round 4). The remaining cost is the
    irreducible per-orderkey aggregate of lineitem."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    lq = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).cast("decimal(18,4)").alias("sq"))
        .where(F.col("sq") > 150)
    )
    return (
        lq.join(o, lq.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("sq").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "q_tpch_q19",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           CAST(COALESCE(SUM({_REV_SQL}), CAST(0 AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 25)
       OR (p_brand = 'Brand#9' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 20 AND 35)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue: disjunction of conjunctive band
    predicates spanning both join sides — the filter must run after
    the join, but the p_brand IN prefilter is pushed into the
    broadcast build side by Catalyst (verified in the plan)."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    pred = (
        ((F.col("p_brand") == "Brand#13") & sz.between(1, 10) & q.between(1, 15))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 20) & q.between(10, 25))
        | ((F.col("p_brand") == "Brand#9") & sz.between(1, 30) & q.between(20, 35))
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return j.where(pred).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum(_rev()).cast("decimal(18,4)"), zero)
        .cast("double")
        .alias("revenue"),
    )


@query(
    "q_tpch_q22",
    oracle="""
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT c_nationkey % 5 AS cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE c_acctbal > (
          SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                      / COUNT(*) AS DOUBLE)
          FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
    ) t
    GROUP BY cntrycode
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity: above-average-balance customers
    with no urgent orders (scalar subquery + anti join with a pushed
    condition; every sf0.01 customer has >=1 order, so 'no 1-URGENT
    order' keeps the anti-join non-degenerate; c_nationkey % 5
    substitutes for the absent phone country code). The average is an
    exact decimal sum -> double divide, so the > comparison is
    bit-identical in both engines."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_q22_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_q22_orders")
    return load(spark, sf_dir, "customer").sparkSession.sql(
        """
        SELECT cntrycode, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM (
          SELECT c_nationkey % 5 AS cntrycode, c_acctbal, c_custkey
          FROM v_q22_customer
          WHERE c_acctbal > (
              SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                          / COUNT(*) AS DOUBLE)
              FROM v_q22_customer WHERE c_acctbal > 0.0)
            AND NOT EXISTS (SELECT 1 FROM v_q22_orders
                            WHERE o_custkey = c_custkey
                              AND o_orderpriority = '1-URGENT')
        ) t
        GROUP BY cntrycode
        """
    )


@query(
    "q_tpch_q9",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(SUM({_REV_SQL}) AS DECIMAL(18,4)) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit per nation/year, adapted: testdata has
    no partsupp, so profit = revenue (the ps_supplycost term drops);
    '%red%' replaces '%green%' (the color vocabulary of the driver's
    p_name fixture).

    Physical shape: part/supplier/nation all broadcast — lineitem
    never shuffles for the three dim joins; the single shuffle is the
    orders sort-merge on orderkey, then one partial+final hash agg on
    (nation, year). At 100 TB the '%red%' filter on the broadcast
    part side prunes most of lineitem before that shuffle via the
    runtime broadcast filter."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(_rev()).cast("decimal(18,4)").cast("double").alias("sum_profit"))
    )


@query(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({_REV_SQL}) AS DECIMAL(18,4)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: quarterly revenue per supplier, keep the
    max-revenue supplier(s). The max is computed as a 1-row aggregate
    broadcast back against the revenue set (never an unpartitioned
    window — that would serialize on one task at scale); equality is
    on the exact DECIMAL sum, so ties are kept as TPC-H specifies."""
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).cast("decimal(18,4)").alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    s = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_rev == mx.mx)
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


@query(
    "q_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'
      AND p_size IN (1,4,9,14,19,24,29,34,39,44,49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 parts/supplier relationship, adapted: lineitem stands in
    for the absent partsupp as the part-supplier relation, and
    negative account balance stands in for the 'customer complaints'
    supplier exclusion.

    The exclusion list is an anti join against a broadcast dim; the
    distinct count shuffles once on the (brand, type, size) grouping
    key with partial distinct aggregation upstream."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin([1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49])
    )
    bad = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q17",
    oracle="""
    WITH agg AS (
      SELECT l_partkey AS pk,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                AS DECIMAL(18,4)) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN agg ON pk = l_partkey
    WHERE p_brand = 'Brand#23'
      AND 5 * CAST(l_quantity AS DECIMAL(18,4)) * cnt < sum_qty
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue: rows under 20% of their
    part's mean quantity. The float threshold `l_quantity <
    0.2*avg(qty)` is restated exactly as `5*qty*cnt < sum_qty` in
    decimal/integer arithmetic — no IEEE rounding at the decision
    boundary, so both engines pick identical rows.

    The per-part mean is a window over the broadcast-filtered slice
    (only Brand#23 partkeys survive before the shuffle), not a
    self-join of full lineitem — one narrow shuffle of the filtered
    rows instead of two wide ones."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    w = Window.partitionBy("l_partkey")
    joined = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .withColumn("sum_qty", F.sum(dec("l_quantity")).over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
    )
    return (
        joined.where(F.lit(5) * dec("l_quantity") * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (
                F.sum(dec("l_extendedprice")).cast("decimal(18,4)").cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@query(
    "q_tpch_q20",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3' AND s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300)
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential part promotion, adapted: suppliers in one nation
    who shipped >300 total quantity of 'red%'-named parts in a year
    (partsupp availability-vs-stock halves into a shipped-quantity
    HAVING over lineitem).

    Shape: broadcast part filter prunes lineitem, one grouped HAVING
    on suppkey (100s of rows at any scale), then a semi join that
    broadcasts INTO the supplier dim."""
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    eligible = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("tot_qty"))
        .where(F.col("tot_qty") > 300)
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(eligible), s.s_suppkey == eligible.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


# ---------------------------------------------------------------------------
# Q2 / Q11 / Q21 — the three canon queries whose original forms need the
# partsupp relation (and receipt/commit dates) absent from TESTDATA.md.
# Round 4 closes them by DERIVING a deterministic partsupp from
# part x supplier on BOTH sides of the oracle differential (the same
# synthesize-in-query pattern q_multimodal_frames uses for blobs):
# 4 suppliers per part, chosen by modular stride over the supplier
# count, with integer-derived availqty and a cents-scaled supplycost so
# every aggregate stays exact (scaled-bigint sums, one IEEE divide at
# the end — never a float sum).

_PS_CTES = """
    ps0 AS (
      SELECT p_partkey AS ps_partkey,
             CAST((p_partkey + i * 13) % (SELECT COUNT(*) FROM supplier)
                  AS BIGINT) AS ps_suppkey
      FROM part, range(0, 4) t(i)
    ),
    ps AS (
      SELECT ps_partkey, ps_suppkey,
             CAST(1 + (ps_partkey * 37 + ps_suppkey * 11) % 9999 AS INT)
               AS ps_availqty,
             CAST((ps_partkey * 31 + ps_suppkey * 17) % 99900 + 100 AS BIGINT)
               AS ps_cost_cents
      FROM ps0
    )
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic partsupp: (ps_partkey, ps_suppkey, ps_availqty,
    ps_cost_cents), 4 distinct suppliers per part.

    Shape at scale: a map-side explode of part (no shuffle) against a
    broadcast 1-row supplier count — partsupp is never materialized,
    it streams out of the part scan 4x wider."""
    s_cnt = (
        load(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).alias("__S"))
    )
    base = (
        load(spark, sf_dir, "part")
        .select(F.col("p_partkey").alias("ps_partkey"))
        .crossJoin(F.broadcast(s_cnt))
        .select(
            "ps_partkey",
            "__S",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("__i"),
        )
        .select(
            "ps_partkey",
            F.pmod(F.col("ps_partkey") + F.col("__i") * 13, F.col("__S"))
            .cast("long")
            .alias("ps_suppkey"),
        )
    )
    return base.select(
        "ps_partkey",
        "ps_suppkey",
        (
            1
            + F.pmod(
                F.col("ps_partkey") * 37 + F.col("ps_suppkey") * 11, F.lit(9999)
            )
        )
        .cast("int")
        .alias("ps_availqty"),
        (
            F.pmod(
                F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17,
                F.lit(99900),
            )
            + 100
        )
        .cast("long")
        .alias("ps_cost_cents"),
    )


@query(
    "q_tpch_q2",
    oracle="""
    WITH """ + _PS_CTES + """,
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    minc AS (
      SELECT ps_partkey, MIN(ps_cost_cents) AS min_cents
      FROM ps JOIN eu ON ps_suppkey = s_suppkey
      GROUP BY ps_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           CAST(ps_cost_cents AS DOUBLE) / 100.0 AS supplycost
    FROM part
    JOIN ps ON ps_partkey = p_partkey
    JOIN eu ON ps_suppkey = s_suppkey
    JOIN minc ON minc.ps_partkey = ps.ps_partkey
             AND ps_cost_cents = min_cents
    WHERE p_size = 15 AND p_type <> 'PROMO'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier (canon shape over the derived
    partsupp): for each EUROPE-sourced part of one size/type, the
    supplier(s) achieving the regional minimum supply cost.

    Shape at scale: the supplier->nation->region chain collapses to a
    broadcast dim (suppliers are small vs parts); the per-part MIN is
    a partial+final hash agg over the partsupp stream; the min-cost
    match joins back on (ps_partkey, cost) — an equi join, never a
    correlated subquery per row; top-100 is TakeOrderedAndProject.
    The ordering (s_acctbal DESC, n_name, s_name, p_partkey) is total:
    (p_partkey, s_name) is unique per row, so the LIMIT is
    deterministic."""
    ps = _partsupp(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps_eu = ps.join(F.broadcast(eu), ps.ps_suppkey == eu.s_suppkey)
    minc = ps_eu.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_cost_cents").alias("min_cents")
    )
    p = load(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") != "PROMO")
    )
    return (
        ps_eu.join(
            minc,
            (ps_eu.ps_partkey == minc.mc_partkey)
            & (ps_eu.ps_cost_cents == minc.min_cents),
        )
        .join(F.broadcast(p), ps_eu.ps_partkey == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            exact_div(F.col("ps_cost_cents"), F.lit(100)).alias("supplycost"),
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(100)
    )


@query(
    "q_tpch_q11",
    oracle="""
    WITH """ + _PS_CTES + """,
    nat AS (
      SELECT s_suppkey FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
    ),
    val AS (
      SELECT ps_partkey,
             CAST(SUM(ps_cost_cents * ps_availqty) AS BIGINT) AS cents
      FROM ps JOIN nat ON ps_suppkey = s_suppkey
      GROUP BY ps_partkey
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total_cents FROM val)
    SELECT ps_partkey, CAST(cents AS DOUBLE) / 100.0 AS value
    FROM val, tot
    WHERE cents * 1000 > total_cents
    ORDER BY value DESC, ps_partkey
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock (canon shape over the derived partsupp):
    per-part inventory value for one nation's suppliers, keeping parts
    whose value exceeds 0.1% of the nation total.

    All sums are cents-scaled BIGINTs (exact under any partitioning);
    the single IEEE divide happens on output. The national total is a
    1-row aggregate broadcast back as the HAVING threshold — the
    partsupp stream is scanned once for the per-part values and the
    tiny val relation (|parts| rows) re-aggregates for the total, so
    no second pass over partsupp at scale. Fraction 1/1000 compares
    as cents*1000 > total_cents: pure integer, no float threshold."""
    ps = _partsupp(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    nat = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    val = (
        ps.join(F.broadcast(nat), ps.ps_suppkey == nat.s_suppkey)
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_cost_cents") * F.col("ps_availqty"))
            .cast("long")
            .alias("cents")
        )
    )
    tot = val.agg(F.sum("cents").cast("long").alias("total_cents"))
    return (
        val.crossJoin(F.broadcast(tot))
        .where(F.col("cents") * 1000 > F.col("total_cents"))
        .select(
            "ps_partkey", exact_div(F.col("cents"), F.lit(100)).alias("value")
        )
        .orderBy(F.desc("value"), F.asc("ps_partkey"))
    )


@query(
    "q_tpch_q21",
    oracle="""
    WITH l AS (
      SELECT l_orderkey, l_suppkey,
             ((l_orderkey * 7 + l_linenumber * 3) % 30 > 14) AS late
      FROM lineitem
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM l l1
    JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM l l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting (canon exists/not-exists
    shape). TESTDATA.md has no l_receiptdate/l_commitdate, so lateness
    derives deterministically from the line identity:
    (l_orderkey*7 + l_linenumber*3) % 30 > 14 — the same modular-date
    substitution Q4/Q12 use, identical on both oracle sides.

    Shape at scale: both EXISTS branches are hash joins on l_orderkey
    (LeftSemi / LeftAnti) with the supplier-inequality as a residual
    post-join filter — never a per-row correlated probe; supplier and
    nation broadcast; the final count groups on s_name (|suppliers|
    rows) and top-100 is TakeOrderedAndProject."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (
            F.pmod(F.col("l_orderkey") * 7 + F.col("l_linenumber") * 3, F.lit(30))
            > 14
        ).alias("late"),
    )
    l1 = l.where("late").alias("l1")
    l2 = l.alias("l2")
    l3 = l.where("late").alias("l3")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    waiting = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
        .join(o, F.col("l1.l_orderkey") == o.o_orderkey, "left_semi")
    )
    return (
        waiting.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )
