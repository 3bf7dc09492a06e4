"""text_bpe_pair_topk first-principles referee: re-derive the BPE
merge-candidate counts with a plain Counter over the raw parquet, and
pin the winning merge against a direct corpus-level greedy count (no
vocab factorization) — so a defect in the vocab-weighting shortcut
that somehow mirrored into the oracle SQL would still fail."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from bigdata_twitter_spark.registry import load_all_operators
from bigdata_twitter_spark.text import analysis

SPECS = load_all_operators()


def _expected_pairs(sf_dir: str) -> Counter:
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet").text
    pair_counts: Counter = Counter()
    for text in texts:
        for w in text.lower().split(" "):
            if len(w) < 2:
                continue
            for i in range(len(w) - 1):
                pair_counts[(w[i], w[i + 1])] += 1
    return pair_counts


def test_bpe_topk_matches_corpus_level_count(spark, sf_dir):
    """The vocab-factorized Spark plan must equal the direct per-
    occurrence corpus count (they are algebraically equal: each word
    occurrence contributes its adjacent pairs exactly once)."""
    expected = _expected_pairs(sf_dir)
    k = analysis.BPE_PAIR_TOPK
    top = sorted(
        expected.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )[:k]
    got = [
        ((r.left_sym, r.right_sym), r.pair_count)
        for r in SPECS["text_bpe_pair_topk"].fn(spark, sf_dir).collect()
    ]
    assert dict(got) == dict(top)
    assert len(got) == min(k, len(expected))


def test_bpe_winner_is_the_greedy_merge(spark, sf_dir):
    """Row 0 under the (count DESC, left, right) total order is the
    pair a reference BPE trainer would merge first."""
    expected = _expected_pairs(sf_dir)
    winner = min(expected.items(), key=lambda kv: (-kv[1], kv[0]))
    rows = (
        SPECS["text_bpe_pair_topk"]
        .fn(spark, sf_dir)
        .orderBy(
            analysis.F.col("pair_count").desc(), "left_sym", "right_sym"
        )
        .collect()
    )
    assert (rows[0].left_sym, rows[0].right_sym) == winner[0]
    assert rows[0].pair_count == winner[1]


def test_bpe_pair_stage_is_vocab_sized(spark, sf_dir):
    """The plan must aggregate words BEFORE exploding pairs — two
    hash-aggregate families (vocab, then pairs) and no pair explode
    reading the scan directly."""
    plan = (
        SPECS["text_bpe_pair_topk"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    # vocab agg + pair agg = at least two exchange/agg families
    assert plan.count("HashAggregate") >= 4, plan
