"""Property test: the distributed BPE trainer (vocab-table rounds +
regexp-based greedy merge) must agree EXACTLY with an independent
pure-Python reference implementation of the published algorithm
(overlapping pair counts, (freq DESC, pair ASC) tie-break, greedy
left-to-right non-overlapping merge) on arbitrary small corpora.

This is the strongest check we have that the \\ba b\\b regexp merge is
semantically identical to symbol-wise greedy merging for alnum
symbols — the tricky equivalence the whole oracle story rests on.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_cdc_spark.operators import bpe


def _ref_merge(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_bpe(words: list[str], n_merges: int) -> list[tuple[str, str, int]]:
    freq = Counter(w for w in words if w)
    vocab: dict[str, tuple[str, ...]] = {w: tuple(w) for w in freq}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += freq[w]
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
        )
        merges.append((left, right, cnt))
        vocab = {w: _ref_merge(s, left, right) for w, s in vocab.items()}
    return merges


words_strategy = st.lists(
    st.text(alphabet="ab0", min_size=1, max_size=5), min_size=1, max_size=8
)


@settings(max_examples=12, deadline=None)
@given(words=words_strategy)
def test_spark_bpe_matches_reference(spark, words):
    docs = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    got = bpe.train_merges(docs, n_merges=3)
    want = _ref_bpe(words, 3)
    assert got == want


def test_spark_bpe_matches_reference_adversarial(spark):
    """Hand-picked corpora that stress the regexp-merge equivalence:
    runs of one symbol, merged symbols adjacent to their own prefixes,
    and digit/letter mixes."""
    cases = [
        ["aaaaa", "aaa", "aa"],          # odd/even runs
        ["abab", "ab", "b", "a"],        # merged symbol vs components
        ["a0a0", "0a0a", "00", "aa"],    # digits in symbols
        ["aab", "aba", "baa"] * 2,       # permutations with shared pairs
        ["b", "a"],                      # no pairs at all after filtering
    ]
    for words in cases:
        docs = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
        assert bpe.train_merges(docs, n_merges=4) == _ref_bpe(words, 4), words


def test_oracle_matches_when_merges_exhaust_early(spark):
    """Low-diversity corpus: the vocabulary runs out of pairs after one
    merge, so rounds 2..n are empty.  The DuckDB oracle must pass
    documents through those empty rounds unchanged (LEFT JOIN guard),
    not collapse to zero rows while Spark (train_merges breaks early)
    still returns every document."""
    import duckdb
    import pandas as pd

    docs_pd = pd.DataFrame({"doc_id": [0, 1], "text": ["ab ab", "ab"]})
    docs = spark.createDataFrame(docs_pd)

    merges = bpe.train_merges(docs, n_merges=4)
    assert merges == [("a", "b", 3)]  # exhausted after round 1

    got = {
        r["doc_id"]: (r["n_words"], r["n_char_syms"], r["n_bpe_syms"])
        for r in bpe.encode_token_counts(docs, merges).collect()
    }
    con = duckdb.connect()
    con.register("documents", docs_pd)
    want_df = con.execute(bpe.encode_oracle_sql(4)).df()
    want = {
        int(r.doc_id): (int(r.n_words), int(r.n_char_syms), int(r.n_bpe_syms))
        for r in want_df.itertuples()
    }
    assert got == want == {0: (2, 4, 2), 1: (1, 2, 1)}

    vocab_rows = con.execute(bpe.vocab_oracle_sql(4)).df()
    assert len(vocab_rows) == 1
    assert (vocab_rows.iloc[0]["left"], vocab_rows.iloc[0]["right"]) == ("a", "b")


def test_distributed_and_local_trainers_agree(spark):
    """Force the distributed fallback (driver_vocab_max=0) and check it
    produces exactly the merges of the local incremental trainer and of
    the independent reference."""
    words = ["lowest", "lower", "low", "newest", "newer", "new", "widest"] * 3
    docs = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    local = bpe.train_merges(docs, n_merges=5)
    dist = bpe.train_merges(docs, n_merges=5, driver_vocab_max=0)
    assert local == dist == _ref_bpe(words, 5)
