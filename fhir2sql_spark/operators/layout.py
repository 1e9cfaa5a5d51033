"""Data-layout operators: multi-dimensional clustering keys.

At 100 TB the cheapest query is the one that never reads the data:
parquet row-group min/max statistics prune scans, but only if rows
that are close in QUERY space are close in FILE space. Sorting by one
column clusters that column only; a Z-order (Morton) key interleaves
the bits of several columns so a range predicate on ANY of them maps
to a bounded set of key ranges — the standard clustering trick behind
Delta/Iceberg `ZORDER BY` re-expressed as a plain deterministic
column expression: `df.repartitionByRange(F.col(zkey)).
sortWithinPartitions(zkey)` then write.

The bit-interleave is exact integer arithmetic generated as ONE
expression string shared verbatim by Spark (`F.expr`) and DuckDB
(oracle SQL), so the clustering key itself is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_sql(x_col: str, y_col: str, bits: int = 8) -> str:
    """SQL expression interleaving the low ``bits`` bits of two integer
    columns into a Morton key: x's bit i lands at position 2i+1, y's at
    2i. Pure `&`/`<<`/`|` on BIGINT — identical semantics in Spark SQL
    and DuckDB. Callers mask the inputs to ``bits`` first."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_col} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y_col} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def morton_key(x_col: str, y_col: str, bits: int = 8) -> Column:
    return F.expr(morton_sql(x_col, y_col, bits)).cast("long")
