"""Query registry backing ``__spark_entry__.py``.

Each query from SURVEY.md §2.3 registers itself here with:
  - a PySpark callable ``(spark, sf_dir) -> DataFrame``
  - optionally, the equivalent DuckDB SQL (the correctness oracle).

Queries with no oracle get the driver's weaker rows-only check
(documented per-query in SURVEY.md §2.3's Oracle column).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle.strip()
        return fn

    return deco


# Registration order is module-import order, but the driver's
# correctness gate samples a PREFIX of the dict (50 queries in round
# 1), so the first 50 must span the engine's whole surface — scans,
# the reference's sync/CDC suite, every join flavor, aggregates,
# windows, streaming shapes, all three UDF kinds, the training-data
# operators (dedup / embeddings / text), and a TPC-H representative —
# rather than whichever modules imported first. Every name here has an
# exact DuckDB oracle except q_agg_approx, kept in as the visible
# representative of the weaker tolerance-checked path.
SHOWCASE = (
    "q_scan_count", "q_scan_project", "q_filter_pred", "q_project_json",
    "q_sync_diff_full", "q_sync_inserts", "q_sync_deletes", "q_sync_updates",
    "q_count_reconcile", "q_cdc_scd2",
    "q_join_inner", "q_join_left", "q_join_semi", "q_join_anti",
    "q_join_broadcast", "q_join_range", "q_join_asof",
    "q_agg_basic", "q_agg_distinct", "q_agg_approx", "q_agg_rollup",
    "q_agg_percentile",
    "q_window_rank", "q_topk_pergroup",
    "q_limit_topk", "q_union_all",
    "q_str_funcs", "q_date_funcs", "q_hof_funcs",
    "q_tumble", "q_session", "q_stream_join", "q_stream_dedup",
    "q_udf_scalar", "q_udaf_pandas", "q_udtf_python",
    "q_dedup_exact", "q_dedup_near", "q_dedup_components", "q_dedup_embed",
    "q_embed_topk", "q_text_langid", "q_text_tfidf",
    "q_decontaminate", "q_pack_sequences",
    "q_multimodal_meta", "q_multimodal_frames",
    "q_pivot", "q_subquery_correlated", "q_tpch_q3",
)


# Headline subset for bench.py's stdout JSON line (the full timing
# dict goes to BENCH_FULL.json; the stdout line must fit the driver's
# 2000-char tail capture). One representative per operator family plus
# every query BASELINE.md cites.
SHOWCASE_BENCH = (
    "q_scan_project", "q_filter_pred", "q_sync_diff_full", "q_sync_updates",
    "q_count_reconcile", "q_join_inner", "q_join_asof", "q_join_range",
    "q_join_broadcast", "q_agg_basic", "q_agg_rollup", "q_agg_percentile",
    "q_window_rank", "q_topk_pergroup", "q_limit_topk", "q_tumble",
    "q_session", "q_stream_dedup", "q_udf_pandas", "q_udaf_pandas",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_embed",
    "q_dedup_embed_bulk", "q_embed_topk",
    "q_embed_ivf", "q_text_langid", "q_text_tfidf", "q_tpch_q3",
    "q_tpch_q5", "q_tpch_q18",
)


def load_all() -> None:
    """Import every query module (side effect: registration), then
    reorder so SHOWCASE queries lead the registry."""
    from fhir2sql_spark import queries  # noqa: F401

    queries.load_all()
    missing = [n for n in SHOWCASE if n not in QUERIES]
    if missing:
        raise RuntimeError(f"SHOWCASE names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in SHOWCASE}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)
