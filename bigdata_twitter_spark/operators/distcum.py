"""Distributed rank / running-sum without data-sized window partitions.

The rank-statistics family (Gini, Lorenz, Mann-Whitney, KS, Spearman,
Hill, ABC classes, trimmed mean) all need an ordered cumulative — a
``row_number`` or running ``sum`` along a total order, optionally per
group — and the naive formulation is a ``Window.partitionBy(group)``
whose partitions are data-sized (a ~5-value group key puts ~20% of the
table in ONE window partition; an ungrouped cumulative puts ALL of it
there).  Correct at sf0.1, a straggler-or-OOM at 100 TB.

This module is the shared two-level fix (VERDICT r8 "Next round" #2),
extracted from the pattern's three prior instances
(``llm/sharding.py:_md5_global_rank``, the ``text_vocab_growth``
range buckets in text/analysis.py, ``win_ntile_pctrank_dist`` in
operators/windows.py):

1. Bucket every row by a PURE FUNCTION of its sort key — a linear cut
   of the key domain from a broadcast 1-row (min, max) aggregate,
   ``bucket = floor((key−min)·NB / (max−min+1))``.  Deterministic by
   construction: unlike ``repartitionByRange``/``spark_partition_id``,
   nothing depends on sampling or on the physical row order of an
   upstream shuffle, so the offsets branch and the data branch can
   never disagree about placement (the repartitionByRange variant of
   this helper failed exactly that way: its RangePartitioner re-sampled
   different boundaries per subtree execution when the input was an
   agg output with nondeterministic intra-partition order).
2. A LOCAL window per ``(bucket, *group)`` computes row_numbers and
   inclusive running sums — partitions are ~(data / NB) under a mild
   key-uniformity assumption (equal keys always share a bucket, the
   same colocation any range scheme gives; a single dominant key is a
   domain-skew problem for every ordered cumulative).
3. Per-(bucket, group) totals — an NB × n_groups table, metadata-
   sized — get a cumulative offset via a window over the bucket id
   (≤ NB rows per group) and broadcast-join back; global rank /
   cumsum = offset + local value.

Two bounded shuffles (the bucket-keyed window exchange + the
broadcast) plus one O(1)-output min/max scan replace one unbounded
sort; nothing anywhere holds more than a bucket-sized slice.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["two_level_cumulative"]

_B = "__tlc_b"
_LRN = "__tlc_lrn"
_PEERS = "__tlc_peers"

# Opt-in runtime total-order guard (VERDICT r10 carried item): when
# set, every two_level_cumulative call verifies IN-PLAN that order_by
# is tie-free within each (bucket, group) — the hazard class behind
# the distcum incident (tied rows make inclusive running sums and
# prevmax nondeterministic per row).  The test suite enables it
# (tests/conftest.py), so every house caller's order spec is swept on
# real data each run; production paths skip the extra window agg.
VALIDATE_ENV = "BDT_DISTCUM_VALIDATE"


def two_level_cumulative(
    df: DataFrame,
    order_by: Sequence[Column | str],
    bucket_key: str,
    group_cols: Sequence[str] = (),
    sum_cols: Sequence[str] = (),
    prevmax_cols: Sequence[str] = (),
    rank_col: str | None = None,
    rank_limit: int | None = None,
    descending: bool = False,
    num_buckets: int | None = None,
    validate_total_order: bool | None = None,
) -> DataFrame:
    """Add a distributed rank and/or inclusive running sums to ``df``.

    ``order_by`` must be a total order within each group (include a
    tie-break key) whenever ``rank_col``, ``sum_cols`` OR
    ``prevmax_cols`` is requested — not just for ranks: an inclusive
    ``F.sum().over(rowsBetween)`` running sum and a strictly-preceding
    running max are both per-row order-dependent, so ties in
    ``order_by`` make their per-row values depend on the
    nondeterministic physical order Spark happens to evaluate tied
    rows in.  (Per-GROUP totals would still be right; the row-level
    cumulatives would not be reproducible.)  ``bucket_key`` is
    the numeric column leading that order; ``descending=True`` when
    ``order_by`` descends in it (buckets are then cumulated high→low).

    Returns ``df``'s columns plus ``rank_col`` (1-based row_number
    along ``order_by`` within each ``group_cols`` group, or globally),
    ``cum_<c>`` (inclusive running sum) for each ``c`` in
    ``sum_cols``, and ``prevmax_<c>`` (running max over STRICTLY
    preceding rows; NULL on the first row — max is subtraction-free,
    so the exclusive form is provided directly) for each ``c`` in
    ``prevmax_cols`` (the skyline sort-sweep shape).

    ``rank_limit=K`` keeps only rows whose rank ≤ K *and* prunes them
    BEFORE the offset join: a global top-K row necessarily has local
    rank ≤ K inside its own bucket, so the post-window filter caps the
    join input at NB × K × groups rows (the Hill top-k path).

    ``validate_total_order`` (default: the ``BDT_DISTCUM_VALIDATE``
    env var, which the test suite sets) adds an in-plan tie detector:
    a ``RANGE BETWEEN CURRENT ROW AND CURRENT ROW`` frame counts
    order-key PEERS — works for arbitrary order expressions including
    ``desc()`` — and any peer group larger than one raises at runtime
    instead of silently producing layout-dependent cumulatives.
    Validation-mode plans trade one optimization away: the CASE wrap
    around ``row_number`` defeats ``InferWindowGroupLimit``, so a
    ``rank_limit`` prunes after the local window instead of map-side —
    tests/test_plans.py pins the production (guard-off) plan.
    """
    if rank_limit is not None and rank_col is None:
        raise ValueError("rank_limit requires rank_col")
    if validate_total_order is None:
        validate_total_order = os.environ.get(VALIDATE_ENV, "0") == "1"
    spark = df.sparkSession
    nb = num_buckets or max(32, spark.sparkContext.defaultParallelism * 2)
    order_exprs = [F.col(c) if isinstance(c, str) else c for c in order_by]
    gcols = list(group_cols)

    # Level 0: deterministic order-preserving buckets from a broadcast
    # (min, max).  floor of a positive-slope linear map is monotone in
    # the key, and equal keys always share a bucket.
    stats = df.agg(
        F.min(bucket_key).alias("__tlc_min"),
        F.max(bucket_key).alias("__tlc_max"),
    )
    span = (F.col("__tlc_max") - F.col("__tlc_min") + 1).cast("double")
    bucketed = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            _B,
            F.floor(
                (F.col(bucket_key) - F.col("__tlc_min")).cast("double")
                * nb
                / span
            ).cast("int"),
        )
        .drop("__tlc_min", "__tlc_max")
    )

    # Level 1: local rank / running sums inside each (bucket, group).
    w_local = Window.partitionBy(_B, *gcols).orderBy(*order_exprs)
    w_run = w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_prev = w_local.rowsBetween(Window.unboundedPreceding, -1)
    if validate_total_order and (rank_col or sum_cols or prevmax_cols):
        # Peers frame: counts rows TIED with the current row under the
        # full order_by (works with desc()/expression orders, unlike a
        # partitionBy on the keys).  The check wraps EVERY local
        # cumulative column — Catalyst prunes unused ones (e.g. _LRN
        # when only sum_cols is requested), so the guard must ride on
        # whichever column actually feeds the output.  Same sorted run
        # as w_local — no extra shuffle, one extra window agg.
        peers = F.count(F.lit(1)).over(
            w_local.rangeBetween(Window.currentRow, Window.currentRow)
        )

        def _chk(col: Column) -> Column:
            return F.when(peers == 1, col).otherwise(
                F.raise_error(
                    F.lit(
                        "two_level_cumulative: order_by is not a total "
                        "order within (bucket, group) — tied rows make "
                        "running sums/prevmax nondeterministic; add a "
                        "tie-break key"
                    )
                )
            )

    else:

        def _chk(col: Column) -> Column:
            return col

    local = bucketed.withColumn(_LRN, _chk(F.row_number().over(w_local)))
    for c in sum_cols:
        local = local.withColumn(f"__tlc_ls_{c}", _chk(F.sum(c).over(w_run)))
    for c in prevmax_cols:
        local = local.withColumn(f"__tlc_lp_{c}", _chk(F.max(c).over(w_prev)))

    # Level 2: per-(bucket, group) totals — NB × groups rows — and
    # their exclusive cumulative along the bucket axis.  Anchored on
    # `local` so the bucket-window subtree is shared, and a pure
    # function of the data either way (no cross-subtree hazard).
    sizes = local.groupBy(_B, *gcols).agg(
        F.max(_LRN).alias("__tlc_cnt"),
        *[F.sum(c).alias(f"__tlc_tot_{c}") for c in sum_cols],
        *[F.max(c).alias(f"__tlc_bm_{c}") for c in prevmax_cols],
    )
    b_order = F.col(_B).desc() if descending else F.col(_B)
    w_off = (
        Window.partitionBy(*gcols)
        .orderBy(b_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_off_prev = (
        Window.partitionBy(*gcols)
        .orderBy(b_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sizes.select(
        _B,
        *gcols,
        (F.sum("__tlc_cnt").over(w_off) - F.col("__tlc_cnt")).alias(
            "__tlc_rn_off"
        ),
        *[
            (
                F.sum(f"__tlc_tot_{c}").over(w_off) - F.col(f"__tlc_tot_{c}")
            ).alias(f"__tlc_off_{c}")
            for c in sum_cols
        ],
        *[
            F.max(f"__tlc_bm_{c}").over(w_off_prev).alias(f"__tlc_pm_{c}")
            for c in prevmax_cols
        ],
    )

    if rank_limit is not None:
        local = local.where(F.col(_LRN) <= rank_limit)

    joined = local.join(F.broadcast(offsets), [_B, *gcols])
    out_cols = [F.col(c) for c in df.columns]
    if rank_col is not None:
        out_cols.append((F.col("__tlc_rn_off") + F.col(_LRN)).alias(rank_col))
    out_cols.extend(
        (F.col(f"__tlc_off_{c}") + F.col(f"__tlc_ls_{c}")).alias(f"cum_{c}")
        for c in sum_cols
    )
    # greatest() ignores NULLs, so the first row of the first non-empty
    # bucket correctly yields NULL (no strictly-preceding row exists).
    out_cols.extend(
        F.greatest(F.col(f"__tlc_pm_{c}"), F.col(f"__tlc_lp_{c}")).alias(
            f"prevmax_{c}"
        )
        for c in prevmax_cols
    )
    out = joined.select(*out_cols)
    if rank_limit is not None:
        out = out.where(F.col(rank_col) <= rank_limit)
    return out
