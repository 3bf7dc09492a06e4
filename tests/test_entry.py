"""Smoke checks of the driver contract surface."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"l_returnflag", "l_linestatus", "sum_qty", "count_order"} <= set(
        df.columns
    )


def test_contract_shapes(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


def test_events_loader_handles_both_ts_encodings(spark, tmp_path):
    """The events fixtures have shipped as TIMESTAMP(NANOS) (rounds
    1-2: arrives as LongType ns under the legacy conf) and as
    timestamp[us] (round 3+: arrives TIMESTAMP_NTZ).  tables.load must
    dispatch on the arriving dtype and produce IDENTICAL TimestampType
    µs output for both — pinned here on synthesized twins so a future
    fixture flip cannot silently break either era (VERDICT r3 #8)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_twitter_spark.tables import load

    # Deliberately includes a sub-µs remainder (…789 ns) to pin the
    # truncating integer division, and a pre-1970 value for sign.
    ns_vals = [1_700_000_000_123_456_789, -123_456_789, 0]
    rows = list(range(len(ns_vals)))
    base = {
        "event_id": pa.array(rows, pa.int64()),
        "user_id": pa.array([7] * len(rows), pa.int64()),
        "event_type": pa.array(["view"] * len(rows)),
        "value": pa.array([1.5] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    }

    ns_dir = tmp_path / "enc_ns"
    us_dir = tmp_path / "enc_us"
    ns_dir.mkdir()
    us_dir.mkdir()
    pq.write_table(
        pa.table({**base, "ts": pa.array(ns_vals, pa.timestamp("ns"))}),
        ns_dir / "events.parquet",
    )
    # DuckDB (and the loader's `ts div 1000`) truncate ns → µs TOWARD
    # ZERO — verified against DuckDB directly; Python's floor `//`
    # would disagree by 1µs on pre-1970 values.
    def trunc_us(v: int) -> int:
        return abs(v) // 1000 * (1 if v >= 0 else -1)

    pq.write_table(
        pa.table(
            {
                **base,
                "ts": pa.array(
                    [trunc_us(v) for v in ns_vals], pa.timestamp("us")
                ),
            }
        ),
        us_dir / "events.parquet",
    )

    out_ns = load(spark, str(ns_dir), "events")
    out_us = load(spark, str(us_dir), "events")
    assert dict(out_ns.dtypes)["ts"] == "timestamp"
    assert dict(out_us.dtypes)["ts"] == "timestamp"
    rows_ns = sorted(out_ns.collect(), key=lambda r: r["event_id"])
    rows_us = sorted(out_us.collect(), key=lambda r: r["event_id"])
    assert rows_ns == rows_us, (rows_ns, rows_us)
