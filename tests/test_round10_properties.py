"""Property tests for the round-10 operators: set-algebra laws for
corpus_diff, Morton-curve bijectivity for the z-order layout, cap
laws for truncate_docs, and token-consistency for pseudonymize."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_cdc_spark.operators import corpus


# --- z-order interleave: pure-Python mirror of the SQL expression ---------

def _interleave(a: int, b: int, bits: int = 8) -> int:
    z = 0
    for j in range(bits):
        z |= ((a >> j) & 1) << (2 * j)
        z |= ((b >> j) & 1) << (2 * j + 1)
    return z


@given(st.integers(0, 255), st.integers(0, 255))
def test_interleave_bijective(a, b):
    """De-interleaving recovers both inputs — the Morton code is a
    bijection, so range-partitioning on z loses no information."""
    z = _interleave(a, b)
    ra = sum(((z >> (2 * j)) & 1) << j for j in range(8))
    rb = sum(((z >> (2 * j + 1)) & 1) << j for j in range(8))
    assert (ra, rb) == (a, b)
    assert 0 <= z < 1 << 16


@given(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255), st.integers(0, 255))
def test_interleave_locality(a1, b1, a2, b2):
    """Same z ⇒ same cell: distinct (a, b) never collide."""
    if (a1, b1) != (a2, b2):
        assert _interleave(a1, b1) != _interleave(a2, b2)


def test_interleave_matches_sql_expression():
    """The Python mirror and the operator's generated SQL agree (the
    SQL is what actually runs; the oracle uses div/mod arithmetic)."""
    from mysql_cdc_spark.operators.layout import _interleave_sql

    expr = _interleave_sql("a", "b")
    for a, b in [(0, 0), (255, 255), (1, 2), (170, 85), (200, 13)]:
        assert eval(expr, {}, {"a": a, "b": b}) == _interleave(a, b)


# --- corpus_diff set algebra ----------------------------------------------

@settings(max_examples=10, deadline=None)
@given(
    st.sets(st.integers(0, 30), max_size=12),
    st.sets(st.integers(0, 30), max_size=12),
    st.sets(st.integers(0, 30), max_size=6),
)
def test_corpus_diff_partitions_ids(spark, old_ids, new_ids, edited):
    """Statuses partition old ∪ new exactly: added = new−old,
    removed = old−new, changed = (old∩new)∩edited, unchanged = rest."""
    old = spark.createDataFrame(
        [(i, f"text {i}", 10) for i in sorted(old_ids)] or [(-1, "x", 1)],
        "doc_id long, text string, n_chars long",
    )
    new = spark.createDataFrame(
        [(i, f"text {i}" + (" edited" if i in edited else ""), 10)
         for i in sorted(new_ids)] or [(-2, "y", 1)],
        "doc_id long, text string, n_chars long",
    )
    got = {r["doc_id"]: r["status"] for r in corpus.corpus_diff(old, new).collect()}
    o = old_ids or {-1}
    n = new_ids or {-2}
    assert set(got) == o | n
    for i in got:
        if i in n and i not in o:
            assert got[i] == "added"
        elif i in o and i not in n:
            assert got[i] == "removed"
        elif i in edited and i in o and i in n:
            assert got[i] == "changed"
        else:
            assert got[i] == "unchanged"


# --- truncate_docs laws ----------------------------------------------------

@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(0, 20), min_size=1, max_size=8), st.integers(1, 12))
def test_truncate_laws(spark, lengths, cap):
    """kept = min(n, cap); truncation flag iff n > cap; re-tokenizing
    the output never exceeds the cap."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(n)) if n else "")
         for i, n in enumerate(lengths)],
        "doc_id long, text string",
    )
    for r in corpus.truncate_docs(docs, max_tokens=cap).collect():
        n = lengths[r["doc_id"]] or 1          # "" splits to one token
        assert r["n_tokens"] == n
        assert r["kept_tokens"] == min(n, cap)
        assert r["was_truncated"] == (n > cap)
        assert len([t for t in r["text"].split(" ") if t != ""]) <= max(cap, 1)


# --- pseudonymize consistency ---------------------------------------------

def test_pseudonymize_token_consistency(spark):
    """Same user ⇒ same token within a salt (joins survive); different
    salts unlink; raw ids never appear in the output."""
    import datetime as dt

    from mysql_cdc_spark.operators.profiling import pseudonymize

    rows = [(i % 3, dt.datetime(2024, 1, 1 + i), "click", float(i * 40))
            for i in range(9)]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, value double")
    a = pseudonymize(ev, salt="s1").collect()
    b = pseudonymize(ev, salt="s2").collect()
    tok_a = {}
    for i, r in enumerate(a):
        uid = rows[i][0]
        tok_a.setdefault(uid, set()).add(r["user_token"])
    assert all(len(s) == 1 for s in tok_a.values())        # consistent
    assert len({next(iter(s)) for s in tok_a.values()}) == 3
    assert {r["user_token"] for r in a}.isdisjoint({r["user_token"] for r in b})
    assert all("user_id" not in r.asDict() for r in a)
