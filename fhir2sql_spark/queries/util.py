"""Determinism helpers shared by all queries (SURVEY.md §2.3 rules).

The oracle compare is an order-insensitive value-hash, so every
numeric output must be bit/value-identical between Spark and DuckDB:

- cast raw doubles (fixtures carry <=2 decimal places, so the cast is
  exact in both engines) to DECIMAL(18,4) *before* arithmetic;
- sums stay in decimal; final outputs re-cast to an explicit decimal
  type so both engines emit the same (precision, scale);
- averages/divisions: compute the exact decimal SUM, cast to DOUBLE,
  divide by the exact COUNT — IEEE division of identical inputs gives
  identical bits in both engines (no round() needed);
- never emit raw timestamps from arithmetic; date_trunc/cast/format.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"
DEC2 = "decimal(18,2)"


def dec(c: Column | str, scale: int = 4) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal(18,{scale})")


def exact_div(num: Column, den: Column) -> Column:
    """Deterministic ratio: exact numerator/denominator -> IEEE double."""
    return (num.cast("double") / den.cast("double")).cast("double")
