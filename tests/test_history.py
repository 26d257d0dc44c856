"""SCD2 interval building and net-change compaction on hand-built
streams (version chains, delete-terminated intervals, net noops,
delete→re-insert collapse)."""

from __future__ import annotations

import datetime

from mysql_cdc_spark.model import ENVELOPE_SCHEMA
from mysql_cdc_spark.operators import history
from mysql_cdc_spark.sources.events_cdc import rows_delta_type

_TS = datetime.datetime(2024, 1, 1)


def _rows(spark, events):
    mk = lambda off, op, bid, bval, aid, aval: (  # noqa: E731
        off, "binlog.000000", _TS, 1, None, "foo", "auto", op, bid, bval, aid, aval, None,
    )
    return rows_delta_type(
        spark.createDataFrame([mk(*e) for e in events], ENVELOPE_SCHEMA)
    )


def test_scd2_versions_and_delete_termination(spark):
    rows = _rows(
        spark,
        [
            (0, "write_rows", None, None, 1, 10.0),
            (1, "write_rows", None, None, 2, 20.0),
            (2, "update_rows", 1, 10.0, 1, 11.0),
            (3, "delete_rows", 2, 20.0, None, None),
        ],
    )
    got = {
        (r["id"], r["valid_from"]): (r["value"], r["valid_to"], r["is_current"])
        for r in history.scd2_intervals(rows).collect()
    }
    assert got == {
        (1, 0): (10.0, 2, False),
        (1, 2): (11.0, None, True),   # current version
        (2, 1): (20.0, 3, False),     # closed by the delete, no new row
    }


def test_net_changes_classification(spark):
    rows = _rows(
        spark,
        [
            (0, "write_rows", None, None, 1, 10.0),
            (1, "write_rows", None, None, 2, 20.0),
            (2, "write_rows", None, None, 3, 30.0),
            (3, "update_rows", 1, 10.0, 1, 11.0),   # net update
            (4, "delete_rows", 2, 20.0, None, None),  # net delete
            (5, "write_rows", None, None, 4, 40.0),   # net insert
            (6, "update_rows", 3, 30.0, 3, 31.0),
            (7, "update_rows", 3, 31.0, 3, 30.0),     # round-trip → noop
            (8, "write_rows", None, None, 5, 50.0),   # beyond hi → invisible
        ],
    )
    got = {
        r["id"]: (r["net_op"], r["old_value"], r["new_value"])
        for r in history.net_changes(rows, (2, 7)).collect()
    }
    assert got == {
        1: ("update", 10.0, 11.0),
        2: ("delete", 20.0, None),
        4: ("insert", None, 40.0),
    }


def test_net_changes_delete_then_reinsert(spark):
    """Delete + re-insert inside the window nets to an update when the
    value changed, and to nothing when it round-trips."""
    rows = _rows(
        spark,
        [
            (0, "write_rows", None, None, 1, 10.0),
            (1, "write_rows", None, None, 2, 20.0),
            (2, "delete_rows", 1, 10.0, None, None),
            (3, "write_rows", None, None, 1, 12.0),   # changed → update
            (4, "delete_rows", 2, 20.0, None, None),
            (5, "write_rows", None, None, 2, 20.0),   # same → noop
        ],
    )
    got = {
        r["id"]: (r["net_op"], r["old_value"], r["new_value"])
        for r in history.net_changes(rows, (1, 5)).collect()
    }
    assert got == {1: ("update", 10.0, 12.0)}


def test_net_changes_replay_equivalence(spark):
    """Compaction contract: state@lo patched with the net set equals
    state@hi, on a random-ish generated stream."""
    import random

    rng = random.Random(7)
    events, off = [], 0
    live: dict[int, float] = {}
    for _ in range(300):
        k = rng.randrange(20)
        if k in live and rng.random() < 0.3:
            events.append((off, "delete_rows", k, live.pop(k), None, None))
        elif k in live:
            nv = float(rng.randrange(100))
            events.append((off, "update_rows", k, live[k], k, nv))
            live[k] = nv
        else:
            nv = float(rng.randrange(100))
            events.append((off, "write_rows", None, None, k, nv))
            live[k] = nv
        off += 1
    rows = _rows(spark, events)
    lo, hi = 99, 299

    def state_at(cut):
        st: dict[int, float] = {}
        for o, op, bid, bval, aid, aval in events:
            if o > cut:
                break
            if op == "delete_rows":
                st.pop(bid, None)
            else:
                st[aid] = aval
        return st

    patched = state_at(lo)
    for r in history.net_changes(rows, (lo, hi)).collect():
        if r["net_op"] == "delete":
            patched.pop(r["id"])
        else:
            patched[r["id"]] = r["new_value"]
    assert patched == state_at(hi)


def test_scd2_lookup_prior_versions(spark):
    """insert→update→delete→re-insert: priors are NULL, the insert
    image, the update image, NULL respectively."""
    from mysql_cdc_spark.operators import history

    rows = spark.createDataFrame(
        [
            (10, "d", "t", 1, 1.0, "insert"),
            (20, "d", "t", 1, 2.0, "update"),
            (30, "d", "t", 1, 2.0, "delete"),
            (40, "d", "t", 1, 9.0, "insert"),
        ],
        "offset long, db string, tbl string, id long, value double, _delta_type string",
    )
    got = {r["offset"]: r["prior_value"] for r in history.scd2_lookup(rows).collect()}
    assert got == {10: None, 20: 1.0, 30: 2.0, 40: None}


def test_scd2_lookup_never_duplicates_facts(spark):
    """Disjoint intervals per key: the left join emits exactly one row
    per fact."""
    from mysql_cdc_spark.operators import history
    from mysql_cdc_spark.sources.events_cdc import changes, rows_delta_type

    rows = rows_delta_type(changes(spark, "/root/testdata/sf0.001"))
    facts_n = rows.filter("_delta_type <> 'update-before'").count()
    assert history.scd2_lookup(rows).count() == facts_n
