"""Crash-atomicity of the event-log compaction swap (VERDICT r7 #7).

The primary swap is one renameat2(RENAME_EXCHANGE) kernel call — the
log dir exists at every instant, holding either the complete old or the
complete verified new data.  The fallback path (two os.replace renames)
has a crash window between the renames; these tests enumerate every
crash state either path can leave behind and assert `_recover_stale_dirs`
always restores a complete log dir without data loss.  Pure-filesystem
tests — no Spark session needed.
"""

from __future__ import annotations

import os

import pytest

from tools.compact_event_log import _exchange_dirs, _recover_stale_dirs


def _mk(d, name, content):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as fh:
        fh.write(content)


def _contents(d):
    return {p: open(os.path.join(d, p)).read() for p in sorted(os.listdir(d))}


@pytest.mark.skipif(
    not _exchange_dirs.__module__, reason="unreachable"  # always runs
)
def test_exchange_swaps_directories_atomically(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _mk(a, "fa", "old")
    _mk(b, "fb", "new")
    if not _exchange_dirs(a, b):
        pytest.skip("renameat2(RENAME_EXCHANGE) unavailable on this platform")
    assert _contents(a) == {"fb": "new"}
    assert _contents(b) == {"fa": "old"}


def test_recover_discards_incomplete_rewrite(tmp_path):
    """Crash before/during verify: .compacting is incomplete, log dir
    untouched — discard the rewrite, keep the data."""
    log = str(tmp_path / "log")
    _mk(log, "data", "old")
    _mk(log + ".compacting", "part", "incomplete")
    _recover_stale_dirs(log)
    assert _contents(log) == {"data": "old"}
    assert not os.path.exists(log + ".compacting")


def test_recover_crash_between_fallback_renames(tmp_path):
    """Fallback path, crash between os.replace(log, backup) and
    os.replace(tmp, log): log dir MISSING, .precompact = old data,
    .compacting = verified new data.  Recovery must restore a complete
    log dir (the verified new copy) and never lose both copies."""
    log = str(tmp_path / "log")
    _mk(log + ".precompact", "data", "old")
    _mk(log + ".compacting", "data", "new-verified")
    _recover_stale_dirs(log)
    assert os.path.isdir(log), "log dir must exist after recovery"
    assert _contents(log) in ({"data": "new-verified"}, {"data": "old"})
    assert not os.path.exists(log + ".precompact")
    assert not os.path.exists(log + ".compacting")


def test_recover_crash_after_swap_before_cleanup(tmp_path):
    """Crash after the exchange (or after both fallback renames) but
    before removing the superseded copy: log dir = new, leftover = old.
    Recovery drops the leftover and leaves the new data untouched."""
    log = str(tmp_path / "log")
    _mk(log, "data", "new-verified")
    _mk(log + ".compacting", "data", "old")
    _recover_stale_dirs(log)
    assert _contents(log) == {"data": "new-verified"}
    assert not os.path.exists(log + ".compacting")

    _mk(log + ".precompact", "data", "old")
    _recover_stale_dirs(log)
    assert _contents(log) == {"data": "new-verified"}
    assert not os.path.exists(log + ".precompact")


def test_recover_is_idempotent_on_clean_state(tmp_path):
    log = str(tmp_path / "log")
    _mk(log, "data", "current")
    _recover_stale_dirs(log)
    _recover_stale_dirs(log)
    assert _contents(log) == {"data": "current"}
