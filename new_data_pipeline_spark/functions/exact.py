"""Hash-stable numeric expressions for oracle parity.

The driver compares Spark results to DuckDB with an order-insensitive
VALUE HASH (exact, no tolerance). Double summation is order-dependent,
so ``SUM(double)`` over different partition orders can differ in the
last ulp between engines. The testdata money columns are clean
2-decimal doubles, so we sum them as decimals (exact, associative) and
cast the final result back to double — both engines then convert the
identical exact decimal to the identical double bit pattern.

The same pattern a production pipeline would use for money at 100 TB:
decimal aggregation is also the *correct* semantics, not just a test
trick (float sums drift at billions of rows).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Per-row money values are < 1e10; keep precision small so 3-factor
# products stay within decimal(38,6) in BOTH engines (DuckDB errors past
# width 38; Spark would silently lose scale). Sums auto-widen.
MONEY = "decimal(12,2)"


def money(col: str | Column) -> Column:
    """Exact decimal view of a 2-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def dsum(col: str | Column, alias: str) -> Column:
    """Exact sum of a money column, returned as double."""
    return F.sum(money(col)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Deterministic average: exact decimal sum, then one double divide.

    (Engines disagree on avg(decimal) result types; sum/count is
    bit-identical everywhere.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(money(c)).cast("double") / F.count(c)).alias(alias)


def oracle_money(col: str) -> str:
    """DuckDB-side twin of money(). Apply to COLUMNS, never to composite
    expressions — casting a product would round it, not the operands."""
    return f"CAST({col} AS {MONEY.upper()})"


def oracle_dsum(col_or_expr: str, alias: str, *, is_column: bool = True) -> str:
    """Exact decimal sum → double. With ``is_column`` the operand is
    wrapped in the money cast; composite expressions must pre-cast each
    operand via :func:`oracle_money` and pass ``is_column=False``."""
    inner = oracle_money(col_or_expr) if is_column else col_or_expr
    return f"CAST(SUM({inner}) AS DOUBLE) AS {alias}"


def oracle_davg(col: str, alias: str) -> str:
    return f"(CAST(SUM({oracle_money(col)}) AS DOUBLE) / COUNT({col})) AS {alias}"
