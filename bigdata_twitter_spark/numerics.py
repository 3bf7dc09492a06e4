"""Numeric-stability helpers for oracle-checked aggregates.

The driver hashes result *values* against a DuckDB run of the oracle
SQL.  Double sums are accumulation-order dependent, and Spark's
multi-partition accumulation order differs from DuckDB's — so every
oracle-checked aggregate over doubles goes through exact DECIMAL
arithmetic and is cast back to DOUBLE only at the very end (a decimal →
nearest-double cast is deterministic and engine-independent).

Precision choice: fixture monetary/measure columns carry 2 fractional
digits and magnitudes < 10^10, so DECIMAL(12,2) is lossless; products
of two such values are DECIMAL(25,4) and of three DECIMAL(38,6) — the
widest product still fits Spark's 38-digit cap *exactly* (no
silent-rounding fallback, which kicks in past precision 38).

Derived statistics (avg/var/corr) are computed *in double arithmetic
from the exact decimal sums*, with the same expression shape on both
sides, so both engines perform the identical IEEE-754 operation
sequence on identical inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(12,2)"


def dec(col: str | Column) -> Column:
    """Lossless decimal view of a 2-fraction-digit double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: str | Column) -> Column:
    """Exact sum of a 2-digit double column, returned as double.

    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(12,2))) AS DOUBLE)``.
    """
    return F.sum(dec(col)).cast("double")


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(12,2))) AS DOUBLE)"


def davg(col: str | Column) -> Column:
    """Exact-sum average: decimal sum → double, divided by count.

    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(12,2))) AS DOUBLE) /
    COUNT(x)`` — double / bigint is the same IEEE op in both engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c)).cast("double") / F.count(c)


def davg_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(12,2))) AS DOUBLE) / COUNT({expr})"


def wide_dbl(sum_col: Column) -> Column:
    """Deterministic decimal→double cast for WIDE sums (unscaled value
    past 2^53), where the engines' native casts diverge: DuckDB casts
    a wide decimal by dividing its (rounded) hugeint representation by
    10^scale — two roundings — while Spark's BigDecimal cast rounds
    once, so the results can differ in the last ulp (observed on the
    per-group Σ price² co-moment, round 6).  Splitting into integer +
    fraction makes the cast a fixed identical IEEE sequence on both
    engines: BIGINT→double is one correctly-rounded instruction, the
    <1 fraction has ≤4 decimal digits (cast correctly rounded in both
    engines), and one final add.

    Domain: the integer part must fit BIGINT (|⌊v⌋| < 2^63 — holds for
    every co-moment this engine accumulates; DECIMAL sums beyond that
    should pre-scale).  Accuracy: within 1 ulp of the integer part —
    for tiny NEGATIVE values (|v| ≪ 1) the hi+lo add cancels and
    relative error degrades, which no sum-of-products use case hits;
    determinism (the actual requirement) holds everywhere.

    Oracle twin: :func:`wide_dbl_sql`.
    """
    hi = F.floor(sum_col).cast("bigint").cast("double")
    lo = (sum_col - F.floor(sum_col)).cast("double")
    return hi + lo


def wide_dbl_sql(sum_expr: str) -> str:
    return (
        f"(CAST(CAST(FLOOR({sum_expr}) AS BIGINT) AS DOUBLE)"
        f" + CAST({sum_expr} - FLOOR({sum_expr}) AS DOUBLE))"
    )
