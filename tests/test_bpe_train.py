"""text_bpe_vocab_train first-principles referee: replay the full
K-round BPE training loop with a plain-Python trainer (dict vocab,
greedy left-to-right in-word merges — the textbook Sennrich et al.
algorithm) over the raw parquet, and pin the learned merge table
bitwise.  A defect in the separator-string representation or the
vocab-factorized pair count that somehow mirrored into the oracle SQL
would still fail here."""

from __future__ import annotations

import pandas as pd

from bigdata_twitter_spark.registry import load_all_operators
from bigdata_twitter_spark.text import analysis

SPECS = load_all_operators()


def _referee_merges(sf_dir: str, rounds: int) -> list[tuple]:
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet").text
    vocab: dict[tuple, int] = {}
    for text in texts:
        for w in text.lower().split(" "):
            # Mirror the engine-side charset guard: words containing
            # the U+001F separator are excluded in all three replays
            # (Spark, DuckDB oracle, this referee) — ADVICE r13 #4.
            if len(w) >= 2 and "\x1f" not in w:
                key = tuple(w)
                vocab[key] = vocab.get(key, 0) + 1
    merges: list[tuple] = []
    for step in range(1, rounds + 1):
        counts: dict[tuple, int] = {}
        for toks, c in vocab.items():
            for i in range(len(toks) - 1):
                pair = (toks[i], toks[i + 1])
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, left, right, left + right, cnt))
        new_vocab: dict[tuple, int] = {}
        for toks, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(toks):
                if (
                    i + 1 < len(toks)
                    and toks[i] == left
                    and toks[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_python_trainer(spark, sf_dir):
    """The learned merge table (pair, merged token, count at merge
    time, in merge order) must equal the textbook trainer's."""
    expected = _referee_merges(sf_dir, analysis.BPE_TRAIN_ROUNDS)
    got = [
        (r.merge_step, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in SPECS["text_bpe_vocab_train"]
        .fn(spark, sf_dir)
        .orderBy("merge_step")
        .collect()
    ]
    assert got == expected


def test_bpe_train_counts_monotone_nonincreasing_is_not_assumed(
    spark, sf_dir
):
    """Sanity on the loop mechanics rather than a (false) monotonicity
    claim: every merged token is the concatenation of its pair, steps
    are 1..K with no gaps, and every count is positive."""
    rows = (
        SPECS["text_bpe_vocab_train"]
        .fn(spark, sf_dir)
        .orderBy("merge_step")
        .collect()
    )
    assert [r.merge_step for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.merged == r.left_sym + r.right_sym
        assert r.pair_count > 0
    assert len(rows) <= analysis.BPE_TRAIN_ROUNDS


def test_bpe_train_handles_newline_and_separator_chars(spark, tmp_path):
    """ADVICE r13 #4: a token containing a literal newline must wrap
    correctly (DOTALL char regex — '.' excludes line terminators in
    both Java and RE2), and a token containing the U+001F separator
    must be excluded identically everywhere.  The Spark result must
    match the Python referee on such a corpus."""
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "ab\ncd ab\ncd ab\ncd xx",  # newline INSIDE a token
                "ab\ncd yy zz",
                "bad\x1fword bad\x1fword qq",  # separator-tainted token
                "ab\ncd zz",
            ],
        }
    )
    d = tmp_path / "sf_nl"
    d.mkdir()
    docs.to_parquet(d / "documents.parquet")
    expected = _referee_merges(str(d), analysis.BPE_TRAIN_ROUNDS)
    got = [
        (r.merge_step, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in SPECS["text_bpe_vocab_train"]
        .fn(spark, str(d))
        .orderBy("merge_step")
        .collect()
    ]
    assert got == expected
    # The newline travelled as a symbol: round 1 merges inside
    # "ab\ncd" (wc 5 dominates), so some learned side contains \n.
    assert any("\n" in r[1] + r[2] for r in got), got
    # And no learned symbol ever contains the separator.
    assert all("\x1f" not in r[1] + r[2] for r in got)
    # The DuckDB oracle agrees on the same corpus (all three replays).
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d / 'documents.parquet'}')"
    )
    odf = con.sql(SPECS["text_bpe_vocab_train"].sql).df()
    oracle = [
        (
            int(r.merge_step),
            r.left_sym,
            r.right_sym,
            r.merged,
            int(r.pair_count),
        )
        for r in odf.itertuples(index=False)
    ]
    assert oracle == expected


def test_bpe_train_later_merges_can_use_earlier_tokens(spark, sf_dir):
    """The loop must feed merged symbols back into later rounds (the
    whole point of training vs one pair count): on this corpus at
    least one learned pair has a multi-char side."""
    rows = SPECS["text_bpe_vocab_train"].fn(spark, sf_dir).collect()
    assert any(
        len(r.left_sym) > 1 or len(r.right_sym) > 1 for r in rows
    ), [tuple(r) for r in rows]


# ---- batched trainer (round 14, VERDICT r13 #4) -----------------------


def _batched_referee(sf_dir: str) -> list[tuple]:
    """Textbook replay of the batched trainer: per round, rank pairs
    by (count DESC, left, right), truncate to the top-C candidates,
    greedily pick up to M non-conflicting, apply all picks."""
    rounds = analysis.BPE_BATCH_ROUNDS
    m_max = analysis.BPE_BATCH_M
    cand_c = analysis.BPE_BATCH_CAND
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet").text
    vocab: dict[tuple, int] = {}
    for text in texts:
        for w in text.lower().split(" "):
            if len(w) >= 2 and "\x1f" not in w:
                key = tuple(w)
                vocab[key] = vocab.get(key, 0) + 1
    merges: list[tuple] = []
    step = 0
    for br in range(1, rounds + 1):
        counts: dict[tuple, int] = {}
        for toks, c in vocab.items():
            for i in range(len(toks) - 1):
                pair = (toks[i], toks[i + 1])
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        ranked = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[:cand_c]
        picks: list[tuple] = []
        for (cl, cr), cnt in ranked:
            if len(picks) >= m_max:
                break
            conflict = any(
                wl in (cl, cr)
                or wr in (cl, cr)
                or cl == wl + wr
                or cr == wl + wr
                or wl == cl + cr
                or wr == cl + cr
                for wl, wr, _ in picks
            )
            if not conflict:
                picks.append((cl, cr, cnt))
        for cl, cr, cnt in picks:
            step += 1
            merges.append((step, br, cl, cr, cl + cr, cnt))
            new_vocab: dict[tuple, int] = {}
            for toks, c in vocab.items():
                out: list[str] = []
                i = 0
                while i < len(toks):
                    if (
                        i + 1 < len(toks)
                        and toks[i] == cl
                        and toks[i + 1] == cr
                    ):
                        out.append(cl + cr)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                key = tuple(out)
                new_vocab[key] = new_vocab.get(key, 0) + c
            vocab = new_vocab
    return merges


def _batched_rows(spark, sf_dir):
    return [
        (
            r.merge_step,
            r.batch_round,
            r.left_sym,
            r.right_sym,
            r.merged,
            r.pair_count,
        )
        for r in SPECS["text_bpe_vocab_train_batched"]
        .fn(spark, sf_dir)
        .orderBy("merge_step")
        .collect()
    ]


def test_bpe_batched_matches_python_trainer(spark, sf_dir):
    assert _batched_rows(spark, sf_dir) == _batched_referee(sf_dir)


def test_bpe_batched_compresses_round_count(spark, sf_dir):
    """The whole point: more merges learned in fewer pair-count
    rounds than the sequential trainer (which learns exactly 1 per
    round)."""
    rows = _batched_rows(spark, sf_dir)
    n_rounds = len({r[1] for r in rows})
    assert len(rows) > n_rounds, (len(rows), n_rounds)
    assert n_rounds <= analysis.BPE_BATCH_ROUNDS


def test_bpe_batched_conflict_rule_blocks_shared_symbols(spark, tmp_path):
    """On a corpus engineered so the top candidates share symbols
    ((b,c) dominates, (a,b)/(c,d) both touch its symbols), the greedy
    selection must SKIP the conflicting candidates — all three
    replays (Spark, DuckDB oracle, Python referee) agree, and the
    round-1 batch is provably not the naive top-M."""
    docs = pd.DataFrame(
        {
            "doc_id": range(1, 13),
            "text": (["abc"] * 5 + ["bcd"] * 4 + ["de"] * 3),
        }
    )
    d = tmp_path / "sf_conflict"
    d.mkdir()
    docs.to_parquet(d / "documents.parquet")
    got = _batched_rows(spark, str(d))
    expected = _batched_referee(str(d))
    assert got == expected
    # Round 1: (b,c)=9 wins; (a,b)=5 and (c,d)=4 conflict on b/c and
    # must be skipped; (d,e)=3 is clean — exactly 2 picks, not 4.
    r1 = [r for r in got if r[1] == 1]
    assert [(r[2], r[3]) for r in r1] == [("b", "c"), ("d", "e")], r1
    # DuckDB oracle agrees on the same corpus.
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d / 'documents.parquet'}')"
    )
    odf = con.sql(SPECS["text_bpe_vocab_train_batched"].sql).df()
    oracle = [
        (
            int(r.merge_step),
            int(r.batch_round),
            r.left_sym,
            r.right_sym,
            r.merged,
            int(r.pair_count),
        )
        for r in odf.itertuples(index=False)
    ]
    assert oracle == expected
