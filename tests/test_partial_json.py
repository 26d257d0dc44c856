"""PARTIAL_UPDATE_ROWS_EVENT (MySQL 8.0
binlog_row_value_options=PARTIAL_JSON, WL#2955): update events whose
after-image JSON columns carry a diff vector (op, path, binary-JSON
value) instead of the full document.  The decoder applies the diffs to
the before image so the envelope surfaces the SAME full after value a
non-partial update would — proven by twin-event equivalence below.
Beyond the reference's 5.1-era event set (mysql_binlog.clj:222-259).
"""

from __future__ import annotations

import json

import pytest

from mysql_cdc_spark.sources.binlog_codec import (
    TYPE_JSON,
    TYPE_LONG,
    TYPE_VARCHAR,
    UPDATE_ROWS_EVENT,
    BinlogWriter,
    JsonDiffs,
    TableDef,
    decode_binlog,
    encode_binary_json,
    parse_json_path,
)

T = TableDef(
    "app", "docs",
    [(TYPE_LONG, None), (TYPE_JSON, 4), (TYPE_VARCHAR, 50)],
)
CAT = {("app", "docs"): ["id", "doc", "note"]}


def _decode(w: BinlogWriter):
    return [e for e in decode_binlog(w.getvalue(), CAT) if e["op"] == "update_rows"]


def test_parse_json_path():
    assert parse_json_path("$") == []
    assert parse_json_path("$.a") == ["a"]
    assert parse_json_path("$.a.b2[3]") == ["a", "b2", 3]
    assert parse_json_path('$."weird key"[0].x') == ["weird key", 0, "x"]
    with pytest.raises(ValueError):
        parse_json_path(".a")
    with pytest.raises(ValueError):
        parse_json_path("$.")


def test_partial_update_applies_diffs_to_before_image():
    before_doc = {"a": 1, "b": {"c": [10, 20, 30]}, "d": "x"}
    w = BinlogWriter()
    w.write_table_map(T, ts=1)
    w.write_partial_update_rows(
        T,
        [(
            [7, encode_binary_json(before_doc), "n"],
            [7, JsonDiffs([
                ("replace", "$.a", 99),
                ("insert", "$.b.c[3]", 40),
                ("remove", "$.d", None),
                ("insert", "$.e", {"new": True}),
                ("replace", "$.b.c[0]", 11),
            ]), "n"],
        )],
        ts=1,
    )
    evs = _decode(w)
    assert len(evs) == 1
    after = json.loads(evs[0]["after"][0]["doc"])
    assert after == {"a": 99, "b": {"c": [11, 20, 30, 40]}, "e": {"new": True}}
    # before image still the original document
    assert json.loads(evs[0]["before"][0]["doc"]) == before_doc
    # non-JSON columns decode normally around the partial value
    assert evs[0]["after"][0]["id"] == 7
    assert evs[0]["after"][0]["note"] == "n"


def test_partial_update_envelope_equals_full_update_twin():
    """The equivalence proof: a PARTIAL_JSON update and a plain v2
    update writing the same final document decode to identical row
    images."""
    before_doc = {"k": [1, 2], "s": "keep"}
    after_doc = {"k": [1, 2, 3], "s": "changed"}

    wp = BinlogWriter()
    wp.write_table_map(T, ts=1)
    wp.write_partial_update_rows(
        T,
        [(
            [1, encode_binary_json(before_doc), "m"],
            [1, JsonDiffs([
                ("insert", "$.k[2]", 3),
                ("replace", "$.s", "changed"),
            ]), "m"],
        )],
        ts=1,
    )
    wf = BinlogWriter()
    wf.write_table_map(T, ts=1)
    wf.write_rows(
        UPDATE_ROWS_EVENT, T,
        [(
            [1, encode_binary_json(before_doc), "m"],
            [1, encode_binary_json(after_doc), "m"],
        )],
        ts=1, v2=True,
    )
    ep, ef = _decode(wp)[0], _decode(wf)[0]
    assert ep["before"] == ef["before"]
    assert json.loads(ep["after"][0]["doc"]) == json.loads(ef["after"][0]["doc"])


def test_partial_update_full_document_column_bit_clear():
    """A JSON after value given as a full document (not JsonDiffs)
    keeps its partial bit clear and decodes as a normal document."""
    w = BinlogWriter()
    w.write_table_map(T, ts=1)
    w.write_partial_update_rows(
        T,
        [(
            [5, encode_binary_json({"v": 1}), "a"],
            [5, encode_binary_json({"v": 2}), "b"],
        )],
        ts=1,
    )
    ev = _decode(w)[0]
    assert json.loads(ev["after"][0]["doc"]) == {"v": 2}


def test_partial_update_null_json_after():
    w = BinlogWriter()
    w.write_table_map(T, ts=1)
    w.write_partial_update_rows(
        T,
        [([3, encode_binary_json({"v": 1}), "a"], [3, None, "a"])],
        ts=1,
    )
    ev = _decode(w)[0]
    assert ev["after"][0]["doc"] is None


def test_partial_update_bad_path_raises_and_quarantines():
    """A diff that does not navigate (out-of-sync replica state /
    corrupt event) must raise — and dead-letter in quarantine mode —
    never silently produce a wrong document."""
    w = BinlogWriter()
    w.write_table_map(T, ts=1)
    w.write_partial_update_rows(
        T,
        [(
            [1, encode_binary_json({"a": 1}), "x"],
            [1, JsonDiffs([("replace", "$.missing.deep", 5)]), "x"],
        )],
        ts=1,
    )
    w.write_xid(9, ts=1)
    with pytest.raises(ValueError, match="does not navigate"):
        decode_binlog(w.getvalue(), CAT)
    evs = decode_binlog(w.getvalue(), CAT, on_error="quarantine")
    assert [e["op"] for e in evs] == [
        "format_description", "table_map", "quarantine", "xid"
    ]


def test_partial_update_replace_missing_key_raises():
    w = BinlogWriter()
    w.write_table_map(T, ts=1)
    w.write_partial_update_rows(
        T,
        [(
            [1, encode_binary_json({"a": 1}), "x"],
            [1, JsonDiffs([("replace", "$.nope", 5)]), "x"],
        )],
        ts=1,
    )
    with pytest.raises(ValueError, match="does not apply"):
        decode_binlog(w.getvalue(), CAT)


def test_partial_update_root_replace():
    w = BinlogWriter()
    w.write_table_map(T, ts=1)
    w.write_partial_update_rows(
        T,
        [(
            [1, encode_binary_json({"old": 1}), "x"],
            [1, JsonDiffs([("replace", "$", [1, 2, 3])]), "x"],
        )],
        ts=1,
    )
    ev = _decode(w)[0]
    assert json.loads(ev["after"][0]["doc"]) == [1, 2, 3]


def test_partial_update_multiple_rows_in_one_event():
    docs = [{"n": i} for i in range(4)]
    rows = [
        (
            [i, encode_binary_json(docs[i]), "w"],
            [i, JsonDiffs([("replace", "$.n", i * 10)]), "w"],
        )
        for i in range(4)
    ]
    w = BinlogWriter()
    w.write_table_map(T, ts=1)
    w.write_partial_update_rows(T, rows, ts=1)
    ev = _decode(w)[0]
    assert [json.loads(img["doc"])["n"] for img in ev["after"]] == [0, 10, 20, 30]
