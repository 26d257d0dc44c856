"""Argument-validation regressions for the tools/ CLIs.

r14 ADVICE low #2: tools/state_scale.py only errored when ALL
--provider= values were unknown, so a typo alongside a valid value was
silently dropped — the exact silent-narrowing failure the r13 fix was
meant to prevent.  Each value is now validated individually.
"""

from __future__ import annotations

import pytest

from tools.state_scale import _PROVIDERS, _select_providers


def test_no_provider_args_runs_all():
    assert _select_providers(["state_scale.py", "10000"]) == dict(_PROVIDERS)


def test_single_valid_provider():
    tag = sorted(_PROVIDERS)[0]
    assert list(_select_providers(["x", f"--provider={tag}"])) == [tag]


def test_typo_alongside_valid_provider_errors():
    tag = sorted(_PROVIDERS)[0]
    with pytest.raises(SystemExit) as exc:
        _select_providers(["x", f"--provider={tag}", "--provider=typo"])
    assert "typo" in str(exc.value)


def test_all_unknown_still_errors():
    with pytest.raises(SystemExit):
        _select_providers(["x", "--provider=nope"])


def test_duplicates_deduped_order_preserved():
    tags = sorted(_PROVIDERS)
    if len(tags) >= 2:
        argv = ["x", f"--provider={tags[1]}", f"--provider={tags[0]}",
                f"--provider={tags[1]}"]
        assert list(_select_providers(argv)) == [tags[1], tags[0]]
