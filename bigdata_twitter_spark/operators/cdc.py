"""Batch CDC merge (SURVEY.md §2.N extras): apply a changelog delta to
a base snapshot — the MERGE/upsert pass that keeps a 100-TB curated
corpus current without rewriting it from raw.

The fixture has no physical base/delta pair, so both are DERIVED
deterministically from the events table (base = all events; delta =
corrections to every third event, timestamped one hour later), which
keeps the operator fully DuckDB-oracle-checkable.  The merge itself is
the generic shape: union the snapshots, keep the latest version per
key (ts, then a deterministic source tiebreak).

Scale posture: one keyed window over the union — a single shuffle on
the merge key.  On a real lakehouse the same plan runs partition-
pruned: the delta's touched partition set restricts the base scan, so
cost tracks the delta, not the snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

# Every third event receives a correction in the synthetic delta.
DELTA_MOD = 3


@query(
    "merge_upsert",
    sql=f"""
    WITH delta AS (
        SELECT event_id,
               ts + INTERVAL 1 HOUR AS ts,
               user_id, event_type,
               round(value * 2, 2) AS value,
               props, 1 AS src
        FROM events
        WHERE event_id % {DELTA_MOD} = 0
    ),
    unioned AS (
        SELECT event_id, ts, user_id, event_type, value, props, 0 AS src
        FROM events
        UNION ALL
        SELECT * FROM delta
    )
    SELECT event_id, ts, user_id, event_type, value, props,
           src = 1 AS from_delta
    FROM unioned
    QUALIFY row_number() OVER (
        PARTITION BY event_id ORDER BY ts DESC, src DESC) = 1
    """,
    tables=("events",),
    scale_note=(
        "MERGE-as-window: union(base, delta) → keep latest per key via "
        "one row_number window — a single shuffle on event_id, no "
        "driver-side diffing. At 100 TB the base side is partition-"
        "pruned to the delta's touched partitions before the union; "
        "the keep-latest window is the same code (see win_dedup_latest "
        "for the pure-compaction twin)."
    ),
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a synthetic correction delta to the events snapshot,
    keeping the newest version of each event_id."""
    e = load(spark, sf_dir, "events")
    base = e.withColumn("src", F.lit(0))
    delta = (
        e.filter(F.col("event_id") % DELTA_MOD == 0)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
        .withColumn("value", F.round(F.col("value") * 2, 2))
        .withColumn("src", F.lit(1))
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("ts").desc(), F.col("src").desc()
    )
    return (
        base.unionByName(delta)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            "value",
            "props",
            (F.col("src") == 1).alias("from_delta"),
        )
    )


@query(
    "cdc_scd2_intervals",
    sql="""
    SELECT user_id, event_type AS state,
           ts AS valid_from,
           lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS valid_to,
           lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) IS NULL AS is_current
    FROM events
    """,
    tables=("events",),
    scale_note=(
        "SCD Type-2 interval construction: each change event opens a "
        "validity window closed by the user's next change (lead() over "
        "the user-keyed, fully tiebroken order) — one shuffle on the "
        "dimension key, one partition-local sort, no self-join. This is "
        "the lakehouse dimension-history pattern; at 100 TB the window "
        "state is one row, and the downstream as-of lookup against "
        "these intervals is join_asof's plan."
    ),
)
def cdc_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) validity intervals per user:
    every event opens a state interval closed by the next event."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# Synthetic snapshot pair for the diff: v1 misses every 7th key
# (later inserts), v2 misses every 5th (deletes) and re-prices every
# 3rd (updates).  Both snapshots are pure functions of the orders
# table, so the diff stays DuckDB-oracle-checkable.
V1_SKIP_MOD = 7
V2_SKIP_MOD = 5
UPDATE_MOD = 3


@query(
    "cdc_snapshot_diff",
    sql=f"""
    WITH v1 AS (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_orderkey % {V1_SKIP_MOD} <> 0
    ), v2 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % {UPDATE_MOD} = 0
                    THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE o_orderkey % {V2_SKIP_MOD} <> 0
    )
    SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
           CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
                WHEN v2.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           v1.o_totalprice AS old_totalprice,
           v2.o_totalprice AS new_totalprice
    FROM v1 FULL OUTER JOIN v2 USING (o_orderkey)
    WHERE v1.o_orderkey IS NULL
       OR v2.o_orderkey IS NULL
       OR v1.o_totalprice <> v2.o_totalprice
    """,
    tables=("orders",),
    scale_note=(
        "Change-data-feed by snapshot diff (the fallback CDC when no "
        "changelog exists): ONE full-outer sort-merge join on the "
        "primary key, unchanged rows filtered before anything else "
        "consumes the feed. At 100 TB both snapshots arrive "
        "partition-pruned to the compared partition set and the join "
        "is co-partitioned if the snapshots share bucketing (see "
        "join_bucketed_colocated); output size tracks the churn rate, "
        "not the snapshot size."
    ),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level insert/update/delete feed between two derived
    snapshots of the orders table."""
    o = load(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % V1_SKIP_MOD != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("old_totalprice")
    )
    v2 = o.filter(F.col("o_orderkey") % V2_SKIP_MOD != 0).select(
        "o_orderkey",
        # An exact-in-binary delta (+1000.0): float*1.1 then round(.., 2)
        # is NOT bit-identical between Spark (BigDecimal HALF_UP) and
        # DuckDB (libm) on some values; addition of an exact constant is.
        F.when(
            F.col("o_orderkey") % UPDATE_MOD == 0,
            F.col("o_totalprice") + F.lit(1000.0),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("new_totalprice"),
    )
    joined = v1.join(v2, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("old_totalprice").isNull(), F.lit("insert"))
        .when(F.col("new_totalprice").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return (
        joined.filter(
            F.col("old_totalprice").isNull()
            | F.col("new_totalprice").isNull()
            | (F.col("old_totalprice") != F.col("new_totalprice"))
        )
        .select(
            "o_orderkey",
            change.alias("change_type"),
            "old_totalprice",
            "new_totalprice",
        )
    )


@query(
    "join_pit_scd2",
    sql="""
    WITH dim AS (
        SELECT user_id, event_type AS state,
               ts AS valid_from,
               lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS valid_to
        FROM events WHERE event_type <> 'purchase'
    )
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           d.state AS state_at_purchase,
           d.valid_from AS state_since
    FROM events p
    LEFT JOIN dim d
      ON d.user_id = p.user_id
     AND d.valid_from <= p.ts
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    WHERE p.event_type = 'purchase'
    """,
    tables=("events",),
    scale_note=(
        "POINT-IN-TIME lookup against an SCD2 dimension — the "
        "canonical warehouse join: each fact row matches the exactly "
        "one dimension version whose half-open validity interval "
        "[valid_from, valid_to) contains the fact time, with the "
        "current version's open interval (valid_to NULL) matching "
        "everything since its open.  Interval construction is "
        "cdc_scd2_intervals' one keyed window; the lookup co-shuffles "
        "both sides on the dimension key, and because intervals "
        "partition the timeline per key the join multiplicity is "
        "EXACTLY one (or zero before the first version) — never a "
        "range-join blowup.  At 100 TB this executes as join_asof's "
        "plan (last version at-or-before fact time), which is "
        "equivalent precisely because the intervals tile the "
        "timeline; facts predating the first version survive via the "
        "left join with a null state."
    ),
)
def join_pit_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase annotated with the user's state (SCD2 version)
    valid at purchase time; pre-history purchases keep null state."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        e.filter(F.col("event_type") != "purchase")
        .select("user_id", "event_type", "ts", "event_id")
        .withColumn("valid_to", F.lead("ts").over(w))
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            "valid_to",
        )
    )
    p = e.filter(F.col("event_type") == "purchase").alias("p")
    d = dim.alias("d")
    return p.join(
        d,
        (F.col("d.user_id") == F.col("p.user_id"))
        & (F.col("d.valid_from") <= F.col("p.ts"))
        & (
            F.col("d.valid_to").isNull()
            | (F.col("p.ts") < F.col("d.valid_to"))
        ),
        "left",
    ).select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("p.user_id").alias("user_id"),
        F.col("p.ts").alias("purchase_ts"),
        F.col("d.state").alias("state_at_purchase"),
        F.col("d.valid_from").alias("state_since"),
    )


# ---- Debezium-envelope CDC apply (round 7) ---------------------------
# The integration seam merge_upsert assumes away: real CDC arrives as
# a JSON ENVELOPE per change ({"op": c|u|d, "before": …, "after": …,
# "ts_ms": …} — the Debezium wire format, stated from its public
# docs), and the applier must parse the envelope, route by op, and
# materialize the final state.  The change stream here is derived
# deterministically from orders (key mod 10: 1 ⇒ delete, 0 ⇒ update
# with price+1, else insert), serialized to real JSON lines, parsed
# back with an explicit schema, and applied onto an empty base — so
# the oracle can state the final table directly from orders and the
# whole serialize→parse→apply loop is hash-verified.
_DBZ_SCHEMA = (
    "op STRING, ts_ms BIGINT, "
    "before STRUCT<o_orderkey: BIGINT, o_totalprice: DOUBLE, "
    "o_orderstatus: STRING>, "
    "after STRUCT<o_orderkey: BIGINT, o_totalprice: DOUBLE, "
    "o_orderstatus: STRING>"
)


@query(
    "cdc_debezium_apply",
    sql="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(CASE WHEN o_orderkey % 10 = 0
                              THEN o_totalprice + 1
                              ELSE o_totalprice END
                         AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderkey % 10 <> 1
    GROUP BY 1
    """,
    tables=("orders",),
    scale_note=(
        "Envelope parsing is per-row codegen (from_json with an "
        "explicit schema — schema-on-read, no inference pass), "
        "routing is a partial-aggregating groupBy on the key taking "
        "the LAST change per key by (ts_ms, op-priority) via one "
        "two-phase max_by — the standard CDC-compaction plan, one "
        "key-hashed shuffle regardless of change volume; deletes "
        "drop at the same step.  The final-state aggregate is "
        "status-sized.  At 100 TB the envelope stream is the Kafka "
        "topic and the same compact-then-apply plan holds per "
        "micro-batch (stream_upsert_versioned is the streaming "
        "sibling)."
    ),
)
def cdc_debezium_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize a deterministic Debezium-style change stream from
    orders, parse it back (explicit schema), apply c/u/d, and
    aggregate the final state per status."""
    from ..numerics import dec

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    row = F.struct(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "o_orderstatus",
    )
    upd = F.struct(
        "o_orderkey",
        (F.col("o_totalprice") + 1).cast("double").alias("o_totalprice"),
        "o_orderstatus",
    )
    k = F.col("o_orderkey") % 10
    envelope = o.select(
        F.to_json(
            F.struct(
                F.when(k == 1, F.lit("d"))
                .when(k == 0, F.lit("u"))
                .otherwise(F.lit("c"))
                .alias("op"),
                (F.col("o_orderkey") * 1000).alias("ts_ms"),
                F.when(k == 1, row).when(k == 0, row).alias("before"),
                F.when(
                    k == 1,
                    F.lit(None).cast(
                        "struct<o_orderkey:bigint,o_totalprice:double,"
                        "o_orderstatus:string>"
                    ),
                )
                .when(k == 0, upd)
                .when(k > 1, row)
                .alias("after"),
            )
        ).alias("line")
    )
    parsed = envelope.select(
        F.from_json("line", _DBZ_SCHEMA).alias("c")
    ).select("c.op", "c.ts_ms", "c.before", "c.after")
    # Compact: last change per key (one change per key here, but the
    # plan is the general CDC compaction), then route by op.
    key = F.coalesce(F.col("after.o_orderkey"), F.col("before.o_orderkey"))
    last = (
        parsed.withColumn("k", key)
        .groupBy("k")
        .agg(F.max_by(F.struct("op", "after"), F.col("ts_ms")).alias("ch"))
    )
    final = last.filter(F.col("ch.op") != "d").select(
        F.col("ch.after.o_orderkey").alias("o_orderkey"),
        F.col("ch.after.o_totalprice").alias("o_totalprice"),
        F.col("ch.after.o_orderstatus").alias("o_orderstatus"),
    )
    return final.groupBy("o_orderstatus").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
    )


# ---- multi-clause MERGE (round 11 wave 4) ------------------------------
# The full Delta/Iceberg MERGE INTO surface beside merge_upsert's
# keep-latest compaction:
#   WHEN MATCHED AND src.op = 'D'  THEN DELETE
#   WHEN MATCHED AND src.op = 'U'  THEN UPDATE
#   WHEN NOT MATCHED AND op = 'I'  THEN INSERT
# The source changelog is DERIVED deterministically from events so the
# whole statement is DuckDB-oracle-checkable: deletes for id % 5 = 0,
# updates for the remaining id % 3 = 0, and brand-new rows (id shifted
# past the key space) from id % 11 = 0.  Source keys are unique per
# target key BY CONSTRUCTION (D wins over U via the disjoint modulus
# split), which is MERGE's own precondition.
MERGE_INSERT_OFFSET = 1_000_000_000


@query(
    "cdc_merge_multi_clause",
    sql=f"""
    WITH src AS (
        SELECT event_id AS k, 'D' AS op,
               NULL::TIMESTAMP AS s_ts, NULL::DOUBLE AS s_value
        FROM events WHERE event_id % 5 = 0
        UNION ALL
        SELECT event_id, 'U', ts + INTERVAL 1 HOUR,
               round(value * 2, 2)
        FROM events WHERE event_id % 5 <> 0 AND event_id % 3 = 0
        UNION ALL
        SELECT event_id + {MERGE_INSERT_OFFSET}, 'I',
               ts + INTERVAL 1 DAY,
               -- halve in exact integer cents: value*0.5 of a 2dp
               -- value is a 3dp half the engines ROUND differently
               CAST(CAST(floor(value * 100) AS BIGINT) // 2 AS DOUBLE)
                   / 100.0
        FROM events WHERE event_id % 11 = 0
    )
    SELECT COALESCE(t.event_id, s.k) AS event_id,
           CASE WHEN s.op = 'U' THEN s.s_ts
                WHEN s.op = 'I' THEN s.s_ts
                ELSE t.ts END AS ts,
           CASE WHEN s.op = 'U' THEN s.s_value
                WHEN s.op = 'I' THEN s.s_value
                ELSE t.value END AS value,
           CASE WHEN t.event_id IS NULL THEN 'insert'
                WHEN s.op = 'U' THEN 'update'
                ELSE 'keep' END AS action
    FROM events t FULL OUTER JOIN src s ON t.event_id = s.k
    -- COALESCE: op is NULL for unmatched target rows, and a bare
    -- NOT (NULL AND true) is NULL, which silently DROPS every
    -- keep-row under three-valued logic (caught by the action-count
    -- referee in tests/test_wave4_ops.py)
    WHERE NOT (COALESCE(s.op, '') = 'D' AND t.event_id IS NOT NULL)
      AND NOT (t.event_id IS NULL AND s.op <> 'I')
    """,
    tables=("events",),
    scale_note=(
        "MERGE INTO with three clauses as ONE full-outer join + "
        "codegen CASE routing — a single key shuffle of target and "
        "changelog, no window, no second pass (the changelog is "
        "unique per key, MERGE's own precondition).  At 100 TB the "
        "target side is partition-pruned to the changelog's touched "
        "partitions (file-skipping on the join key's min/max) and "
        "unmatched target partitions are carried forward untouched — "
        "cost tracks the changelog.  Delete = routed-out row; "
        "deletion-vector sinks (table_deletion_vectors) are the "
        "storage-side twin."
    ),
)
def cdc_merge_multi_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MERGE: delete / update / insert clauses applied to the
    events snapshot from a derived changelog, one full-outer join."""
    e = load(spark, sf_dir, "events").select("event_id", "ts", "value")
    dels = (
        e.filter(F.col("event_id") % 5 == 0)
        .select(
            F.col("event_id").alias("k"),
            F.lit("D").alias("op"),
            F.lit(None).cast("timestamp").alias("s_ts"),
            F.lit(None).cast("double").alias("s_value"),
        )
    )
    upds = (
        e.filter((F.col("event_id") % 5 != 0) & (F.col("event_id") % 3 == 0))
        .select(
            F.col("event_id").alias("k"),
            F.lit("U").alias("op"),
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("s_ts"),
            F.round(F.col("value") * 2, 2).alias("s_value"),
        )
    )
    ins = (
        e.filter(F.col("event_id") % 11 == 0)
        .select(
            (F.col("event_id") + MERGE_INSERT_OFFSET).alias("k"),
            F.lit("I").alias("op"),
            (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("s_ts"),
            (
                F.expr("CAST(floor(value * 100) AS BIGINT) div 2")
                .cast("double")
                / F.lit(100.0)
            ).alias("s_value"),
        )
    )
    src = dels.unionByName(upds).unionByName(ins)
    j = e.join(src, e["event_id"] == src["k"], "full_outer")
    matched = F.col("event_id").isNotNull()
    op = F.coalesce(F.col("op"), F.lit(""))  # NULL op = keep row;
    # bare NOT(NULL AND x) is NULL and silently drops it (3VL)
    return (
        j.where(
            ~((op == "D") & matched)
            & ~(F.col("event_id").isNull() & (op != "I"))
        )
        .select(
            F.coalesce("event_id", "k").alias("event_id"),
            F.when(F.col("op").isin("U", "I"), F.col("s_ts"))
            .otherwise(F.col("ts"))
            .alias("ts"),
            F.when(F.col("op").isin("U", "I"), F.col("s_value"))
            .otherwise(F.col("value"))
            .alias("value"),
            F.when(F.col("event_id").isNull(), "insert")
            .when(F.col("op") == "U", "update")
            .otherwise("keep")
            .alias("action"),
        )
    )
