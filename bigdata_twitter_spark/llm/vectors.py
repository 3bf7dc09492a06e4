"""Shared vector-math expression builders (no operator registrations —
import-safe from any module without affecting registry order).

Both engines accumulate left-to-right and round to 6dp because float
summation order/compensation differs (Kahan vs fold) at the 1e-15
level; rounding BEFORE comparison keeps the oracle hash-stable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

DIMS = 64
PAIR_COSINE_THRESHOLD = 0.4


def duck_cosine(a: str, b: str) -> str:
    """DuckDB fragment: cosine of two DOUBLE-cast float lists, 6dp."""
    dot = (
        f"list_sum(list_transform(range(1, {DIMS + 1}),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )
    na = (
        f"sqrt(list_sum(list_transform(range(1, {DIMS + 1}),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    )
    nb = (
        f"sqrt(list_sum(list_transform(range(1, {DIMS + 1}),"
        f" i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))"
    )
    return f"round({dot} / ({na} * {nb}), 6)"


def spark_cosine(a: str, b: str) -> F.Column:
    """Cosine of two float-array columns via zip_with/aggregate (JVM-side)."""

    def dot(x: str, y: str) -> str:
        return (
            f"aggregate(zip_with({x}, {y},"
            f" (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),"
            f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )

    return F.round(
        F.expr(dot(a, b))
        / (F.sqrt(F.expr(dot(a, a))) * F.sqrt(F.expr(dot(b, b)))),
        6,
    )
