"""Pure-Python tests for the scaling bench's record-keeping policy.

No Spark: these exercise ``scripts/scaling_bench.merge_record``, the
function that decides whether a fresh measurement replaces the on-disk
BENCH_scaling json and which superseded records are archived as
evidence.  The policy under test:

- a non-passing run never clobbers a prior pass (quiet windows are
  rare; see BASELINE.md "measurement integrity");
- a passing run archives ANY measured prior — passing priors extend
  the evidence list, and a non-passing prior at a different level
  geometry is knee evidence (e.g. the membw-limited 4x4-core
  executors record) that must survive a below-the-knee pass.
"""

import importlib.util
import os
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "scaling_bench",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "scaling_bench.py"))
sb = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(sb)


def _run(passed: bool, levels=(1, 4), eff=0.9, at="2026-08-20T00:00Z"):
    return {
        "levels": [{"level": lo} for lo in levels],
        "speedup": 4 * eff,
        "scaling_efficiency": eff,
        "efficiency_vs_hw_ceiling": round(eff / 0.9, 3),
        "efficiency_vs_membw_ceiling": round(eff / 0.8, 3),
        "measured_at": at,
        "pass": passed,
    }


def test_first_run_written_even_on_fail():
    out = _run(False, eff=0.5)
    assert sb.merge_record(out, None) is out
    assert "prior_records" not in out


def test_fail_never_clobbers_prior_pass():
    prior = _run(True)
    out = _run(False, eff=0.4)
    assert sb.merge_record(out, prior) is None


def test_fail_replaces_prior_fail_without_archiving():
    # two failures: latest wins, no archive (a failed window is not
    # evidence worth stacking)
    prior = _run(False, eff=0.5)
    out = _run(False, eff=0.6)
    rec = sb.merge_record(out, prior)
    assert rec is out and "prior_records" not in rec


def test_pass_archives_prior_pass():
    prior = _run(True, levels=(8, 32), eff=0.959, at="2026-08-18T00:00Z")
    out = _run(True, levels=(4, 16), eff=0.889)
    rec = sb.merge_record(out, prior)
    assert rec is out
    assert len(rec["prior_records"]) == 1
    kept = rec["prior_records"][0]
    assert kept["pass"] is True
    assert kept["scaling_efficiency"] == 0.959
    assert set(kept) == set(sb.ARCHIVE_FIELDS)


def test_pass_archives_non_passing_knee_record():
    # the regression the r3 fix targets: a membw-ceiling-limited
    # failure at one geometry must survive a pass at another
    prior = _run(False, levels=(1, 4), eff=0.722, at="2026-08-20T08:00Z")
    prior["efficiency_vs_membw_ceiling"] = 1.127
    out = _run(True, levels=(1, 4), eff=0.85)
    rec = sb.merge_record(out, prior)
    assert rec is out
    kept = rec["prior_records"][0]
    assert kept["pass"] is False
    assert kept["efficiency_vs_membw_ceiling"] == 1.127


def test_archive_chain_accumulates():
    first = _run(True, eff=0.959, at="t1")
    second = sb.merge_record(_run(True, eff=0.889, at="t2"), first)
    third = sb.merge_record(_run(True, eff=0.9, at="t3"), second)
    ats = [r["measured_at"] for r in third["prior_records"]]
    assert ats == ["t1", "t2"]


def test_prior_fail_without_levels_not_archived():
    # degenerate/hand-written FAILING prior lacking measurements:
    # replace, no archive entry fabricated from missing fields
    prior = {"pass": False, "note": "placeholder"}
    out = _run(True)
    rec = sb.merge_record(out, prior)
    assert rec is out and "prior_records" not in rec


def test_prior_pass_without_levels_still_archived():
    # a passing prior is evidence even under an older schema lacking
    # "levels" — archive whatever ARCHIVE_FIELDS it does carry
    prior = {"pass": True, "scaling_efficiency": 0.91,
             "measured_at": "old"}
    out = _run(True)
    rec = sb.merge_record(out, prior)
    assert rec is out
    kept = rec["prior_records"][0]
    assert kept == {"pass": True, "scaling_efficiency": 0.91,
                    "measured_at": "old"}


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
