"""Property-based invariants (hypothesis) for the composable recipes.

The oracle suite checks fixed fixtures; these properties must hold on
ARBITRARY inputs: salting never changes join results, keep-latest
merging is idempotent and last-writer-wins, and gap-and-island
sessionization respects its gap bound. Small deadline-free settings —
each example builds Spark DataFrames."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key (few → collisions)
        st.integers(min_value=0, max_value=1_000_000),  # unique-ish id
        st.floats(min_value=-100, max_value=100, allow_nan=False),
    ),
    min_size=1,
    max_size=60,
)


@given(rows=rows_strategy)
@SETTINGS
def test_salted_join_equals_plain_join(spark, rows):
    from bigdata_twitter_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(f"k{k}", i, v) for k, (i, v) in
         ((k, (idx, v)) for idx, (k, _, v) in enumerate(rows))],
        ["key", "rid", "v"],
    )
    dim = fact.groupBy("key").agg(F.count("*").alias("kn"))
    salted = salted_join(fact, dim, ["key"], ["rid"], buckets=4)
    plain = fact.join(dim, ["key"])
    cols = ["key", "rid", "kn"]
    assert sorted(map(tuple, salted.select(*cols).collect())) == sorted(
        map(tuple, plain.select(*cols).collect())
    )


@given(rows=rows_strategy)
@SETTINGS
def test_keep_latest_idempotent_and_last_wins(spark, rows):
    df = spark.createDataFrame(
        [(k, ts, idx) for idx, (k, ts, _) in enumerate(rows)],
        ["key", "ts", "seq"],
    )
    w = Window.partitionBy("key").orderBy(F.col("ts").desc(), F.col("seq").desc())
    latest = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    got = {(r["key"], r["ts"], r["seq"]) for r in latest.collect()}
    # Model: per key, max by (ts, seq).
    expect = {}
    for idx, (k, ts, _) in enumerate(rows):
        if k not in expect or (ts, idx) > expect[k]:
            expect[k] = (ts, idx)
    assert got == {(k, ts, seq) for k, (ts, seq) in expect.items()}
    # Idempotence: compacting the compacted snapshot is a no-op.
    again = (
        latest.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    assert {(r["key"], r["ts"], r["seq"]) for r in again.collect()} == got


@given(
    ts_lists=st.lists(
        st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=25),
        min_size=1,
        max_size=4,
    )
)
@SETTINGS
def test_sessionization_respects_gap_bound(spark, ts_lists):
    gap = 100
    data = [
        (uid, ts, idx)
        for uid, tss in enumerate(ts_lists)
        for idx, ts in enumerate(tss)
    ]
    df = spark.createDataFrame(data, ["user_id", "ts", "seq"])
    w = Window.partitionBy("user_id").orderBy("ts", "seq")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = df.withColumn(
        "brk",
        F.when(F.col("ts") - F.lag("ts").over(w) > gap, 1).otherwise(0),
    ).withColumn("session_id", F.sum("brk").over(run))
    rows = sess.orderBy("user_id", "ts", "seq").collect()
    by_session = {}
    for r in rows:
        by_session.setdefault((r["user_id"], r["session_id"]), []).append(r["ts"])
    for (uid, _), tss in by_session.items():
        # Within a session, consecutive gaps never exceed the bound.
        assert all(b - a <= gap for a, b in zip(tss, tss[1:]))
    # Across consecutive sessions of one user, the boundary gap exceeds it.
    per_user = {}
    for (uid, sid), tss in sorted(by_session.items()):
        per_user.setdefault(uid, []).append((sid, tss))
    for uid, sessions in per_user.items():
        for (_, a), (_, b) in zip(sessions, sessions[1:]):
            assert b[0] - a[-1] > gap


def test_pack_token_budget_bucket_width_invariance(spark, sf_dir, monkeypatch):
    """The distributed running sum must equal the single-window global
    cumsum for ANY bucket width — associativity is the whole argument
    for the scale shape, so pin it across widths (1 = one bucket per
    doc, huge = effectively one global bucket)."""
    from bigdata_twitter_spark.llm import curation

    def run():
        return {
            (r["doc_id"], r["n_tokens"], r["start_offset"], r["seq_id"])
            for r in curation.pack_token_budget(spark, sf_dir).collect()
        }

    baseline = run()
    for width in (1, 7, 10_000_000):
        monkeypatch.setattr(curation, "PACK_BUCKET_WIDTH", width)
        assert run() == baseline, f"width={width} changed the packing"


@given(doc_id=st.integers(min_value=0, max_value=10_000_000))
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_any_doc_id(doc_id):
    """decode(encode(id)) must reproduce the formula pixels for ANY id,
    not just the 100 materialized fixtures — the codec pair is a pure
    function of doc_id."""
    from bigdata_twitter_spark import binfixtures as bf

    w, h, pix = bf.decode_png(bf.png_bytes(doc_id))
    assert (w, h) == (bf.png_width(doc_id), bf.png_height(doc_id))
    assert len(pix) == w * h
    # spot-check corners + center (full check is O(wh) per example)
    for x, y in ((0, 0), (w - 1, 0), (0, h - 1), (w - 1, h - 1), (w // 2, h // 2)):
        assert pix[y * w + x] == bf.pixel(x, y, doc_id)


@given(doc_id=st.integers(min_value=0, max_value=10_000_000))
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_any_doc_id(doc_id):
    from bigdata_twitter_spark import binfixtures as bf

    rate, n, samples = bf.decode_wav(bf.wav_bytes(doc_id))
    assert rate == 16000 and n == bf.wav_n_samples(doc_id)
    for i in (0, 1, n // 2, n - 1):
        assert samples[i] == bf.wav_sample(i, doc_id)


wm_rows = st.lists(
    st.tuples(
        st.sampled_from(["A", "N", "R"]),  # group
        st.integers(min_value=0, max_value=50_000),  # price cents
        st.integers(min_value=1, max_value=50),  # weight
    ),
    min_size=1,
    max_size=60,
)


@given(rows=wm_rows, width=st.sampled_from([7.3, 100.0, 1000.0, 1e9]))
@SETTINGS
def test_weighted_median_bucket_width_invariance(spark, rows, width, monkeypatch):
    """The bucket-localized exact weighted median must equal the naive
    cumulative scan for ARBITRARY data and ANY positive bucket width
    (bucketing only localizes the search, never changes the answer)."""
    from decimal import Decimal

    from bigdata_twitter_spark.operators import aggregates as agg

    df = spark.createDataFrame(
        [(g, p / 100.0, float(w)) for g, p, w in rows],
        "l_returnflag string, l_extendedprice double, l_quantity double",
    )
    monkeypatch.setattr(agg, "load", lambda *_a, **_k: df)
    monkeypatch.setattr(agg, "WMEDIAN_BUCKET", width)
    got = {
        r["l_returnflag"]: r["weighted_median_price"]
        for r in agg.agg_weighted_median(spark, "ignored").collect()
    }
    by_g: dict = {}
    for g, p, w in rows:
        key = (g, p / 100.0)
        by_g.setdefault(g, {})
        by_g[g][p / 100.0] = by_g[g].get(p / 100.0, Decimal(0)) + Decimal(w)
    expect = {}
    for g, agg_w in by_g.items():
        tot = sum(agg_w.values())
        cum = Decimal(0)
        for p in sorted(agg_w):
            cum += agg_w[p]
            if 2 * cum >= tot:
                expect[g] = p
                break
    assert got == expect


@given(
    dim=st.sets(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=40),
    fact=st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=60),
)
@SETTINGS
def test_bloom_prune_never_drops_a_true_match(spark, dim, fact):
    """For ARBITRARY key sets the Bloom prune must keep every fact row
    whose key is in the dim set (false positives allowed, false
    negatives never)."""
    import pyspark.sql.functions as F  # noqa: F811

    from bigdata_twitter_spark.operators.bloomjoin import (
        bloom_bitmap, prune_by_bloom,
    )

    dim_df = spark.createDataFrame([(k,) for k in dim], "k bigint")
    fact_df = spark.createDataFrame([(k,) for k in fact], "fk bigint")
    bm = bloom_bitmap(dim_df, "k")
    bf = spark.createDataFrame([(bm,)], "bf array<bigint>")
    kept = {
        r["fk"]
        for r in prune_by_bloom(
            fact_df.crossJoin(F.broadcast(bf)), "fk"
        ).collect()
    }
    must_keep = {k for k in fact if k in dim}
    assert must_keep <= kept
