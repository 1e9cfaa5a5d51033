"""Scalar-function suites (SURVEY.md §2.3 M3): string, date, math,
conditional, array, map, json.

The reference's scalar surface is exactly: JSON-path get + string->int
cast (/root/reference/src/main.rs:37-46) and a lowercase() on table
names (src/main.rs:185). Everything else is new engine surface.

Cross-engine determinism notes (empirically verified against DuckDB):
  - regexp kept POSIX-simple (Java vs RE2 divergence);
    no-match regexp_extract returns '' in both engines.
  - power() avoided in favor of exact decimal self-multiplication;
    sqrt is IEEE-correctly-rounded in both; ln checked empirically.
  - all element/slice indexing is 1-based in both engines'
    emitted form (Spark getItem is 0-based — adjusted).
  - map outputs are emitted as extracted scalar columns (sorted key
    list + per-key values), never as a serialized MAP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir2sql_spark.registry import query
from fhir2sql_spark.tables import load
from fhir2sql_spark.queries.util import dec


@query(
    "q_str_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_type) AS type_lower,
           substring(p_name, 1, 8) AS name_prefix,
           concat_ws('-', p_brand, p_type) AS brand_type,
           length(p_name) AS name_len,
           trim(p_name) AS name_trim,
           replace(p_name, ' ', '_') AS name_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           string_split(p_type, ' ')[1] AS type_first,
           p_name LIKE '%green%' AS has_green,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num
    FROM part
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.trim("p_name").alias("name_trim"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.split("p_type", " ").getItem(0).alias("type_first"),
        F.col("p_name").like("%green%").alias("has_green"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS o_year,
           month(o_orderdate) AS o_month,
           dayofmonth(o_orderdate) AS o_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions anchored to fixed literals; all outputs are
    TIMESTAMP/INT (DATE would surface as datetime.date objects on the
    Spark side of the driver's pandas compare vs datetime64 on the
    DuckDB side — round-2 output-type policy)."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("o_year"),
        F.month(d).alias("o_month"),
        F.dayofmonth(d).alias("o_day"),
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).alias(
            "days_to_y2k"
        ),
        F.date_add(d.cast("date"), 30).cast("timestamp").alias("due_date"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.unix_timestamp(d).alias("epoch_s"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,4)), 0) AS DOUBLE) AS price_round,
           CAST(abs(CAST(l_discount AS DECIMAL(18,4)) - 0.05) AS DOUBLE) AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           l_orderkey % 7 AS key_mod,
           CAST(CAST(CAST(l_quantity AS DECIMAL(18,4))
                * CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(18,4)) AS DOUBLE) AS qty_sq,
           sqrt(l_quantity) AS qty_sqrt,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions on DECIMAL-cast inputs. qty_sq is power(x,2) in
    exact decimal form; sqrt stays double (IEEE-correctly-rounded in
    both engines, bit-identical)."""
    l = load(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(dec("l_extendedprice"), 0).cast("double").alias("price_round"),
        F.abs(dec("l_discount") - F.lit("0.05").cast("decimal(18,4)"))
        .cast("double")
        .alias("disc_dev"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        (dec("l_quantity") * dec("l_quantity"))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("qty_sq"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@query(
    "q_case_coalesce",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'high' END AS price_band,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           CASE WHEN o_totalprice > 250000 THEN 'big' ELSE 'small' END AS size_tag
    FROM orders
    """,
)
def q_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.when(F.col("o_totalprice") > 250000, "big")
        .otherwise("small")
        .alias("size_tag"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           embedding[1] AS first_elem,
           embedding[2] AS head_2,
           embedding[3] AS head_3,
           embedding[4] AS head_4,
           list_contains([vec_id % 5, vec_id % 7], CAST(label % 5 AS BIGINT)) AS has_label_mod,
           array_to_string(list_sort([vec_id % 5, vec_id % 7, vec_id % 11]), ',') AS mods_sorted
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over the embedding column. Indexing emitted
    1-based (element_at/list index agree across engines); float32
    values pass through unwidened-exactly. Array-typed columns are
    never emitted raw (the driver's pandas row-sort cannot hash
    list cells — round-1 lesson); slices surface as scalar element
    columns and int lists as joined strings."""
    e = load(spark, sf_dir, "embeddings")
    mods = F.array(F.col("vec_id") % 5, F.col("vec_id") % 7)
    mods3 = F.array(F.col("vec_id") % 5, F.col("vec_id") % 7, F.col("vec_id") % 11)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.element_at("embedding", 2).alias("head_2"),
        F.element_at("embedding", 3).alias("head_3"),
        F.element_at("embedding", 4).alias("head_4"),
        F.array_contains(mods, (F.col("label") % 5).cast("bigint")).alias(
            "has_label_mod"
        ),
        F.array_join(F.transform(F.sort_array(mods3), lambda x: x.cast("string")), ",")
        .alias("mods_sorted"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           2 AS map_size,
           'et,uid' AS keys_sorted,
           event_type AS et_val,
           CAST(user_id AS VARCHAR) AS uid_val
    FROM events
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions (str_to_map/map_keys/element_at), with outputs
    emitted as extracted scalars — the closed-form oracle avoids MAP
    serialization differences (SURVEY §2.3 note). The Spark side
    really builds and probes a MapType column."""
    e = load(spark, sf_dir, "events")
    kv = F.concat(F.lit("et="), F.col("event_type"), F.lit(",uid="), F.col("user_id"))
    m = F.str_to_map(kv, F.lit(","), F.lit("="))
    return e.select(
        "event_id",
        F.size(m).alias("map_size"),
        F.concat_ws(",", F.sort_array(F.map_keys(m))).alias("keys_sorted"),
        F.element_at(m, "et").alias("et_val"),
        F.element_at(m, "uid").alias("uid_val"),
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           json_extract_string(props, '$.k') AS k_tup,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           json_extract_string(props, '$.k') AS k_roundtrip
    FROM events
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON surface: get_json_object, json_tuple, from_json(schema),
    and a to_json round-trip re-extracted (canonical comparison per
    SURVEY §2.3 — raw to_json strings differ in key ordering across
    engines, extracted fields cannot)."""
    e = load(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    roundtrip = F.to_json(F.struct(F.get_json_object("props", "$.k").cast("int").alias("k")))
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            F.json_tuple(F.col("props"), "k").alias("k_tup"),
            parsed.getField("k").alias("k_int"),
            F.get_json_object(roundtrip, "$.k").alias("k_roundtrip"),
        )
    )


@query(
    "q_hof_funcs",
    oracle="""
    WITH s AS (
      SELECT o_orderkey, range(1, CAST(1 + o_orderkey % 8 AS INT) + 1) AS arr
      FROM orders
    )
    SELECT o_orderkey,
           array_to_string(list_transform(arr, x -> x * 2 + 1), ',') AS doubled,
           COALESCE(array_to_string(list_filter(arr, x -> x % 3 = 0), ','), '') AS div3,
           CAST(list_reduce(arr, (a, b) -> a + b) AS BIGINT) AS total,
           len(list_filter(arr, x -> x % 7 = 0)) > 0 AS has_div7
    FROM s
    """,
)
def q_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function surface over integer arrays derived from
    keys (exact arithmetic — no float lambda divergence): transform,
    filter, aggregate (fold), exists. HOF lambdas evaluate inside the
    JVM per row with zero shuffles; arrays are bounded (<= 8 elems) so
    row width stays constant at any scale."""
    o = load(spark, sf_dir, "orders")
    arr = F.sequence(F.lit(1), (F.lit(1) + F.col("o_orderkey") % 8).cast("int"))
    return o.select(
        "o_orderkey",
        F.array_join(
            F.transform(arr, lambda x: (x * 2 + 1).cast("string")), ","
        ).alias("doubled"),
        F.array_join(
            F.transform(F.filter(arr, lambda x: x % 3 == 0), lambda x: x.cast("string")),
            ",",
        ).alias("div3"),
        F.aggregate(
            arr, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("total"),
        F.exists(arr, lambda x: x % 7 == 0).alias("has_div7"),
    )
