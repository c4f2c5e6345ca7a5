#!/usr/bin/env python3
"""Per-key bench-budget gate (r8) — the TIME half of the regression story
whose SHAPE half is plan_census.json: the census catches a plan that
changed, this catches a plan that kept its shape but lost its speed
(codegen fallback, broadcast demotion at runtime, an accidentally
eager probe).

bench_budget.json commits each key's CALIBRATION-NORMALIZED median
(med_seconds / calib_1t from a settled bench run — the calibration
probe is Bench's fixed single-thread FNV loop, so dividing by it
cancels host-speed drift between sessions; the round-5 finding was a
uniform 1.18x per-query inflation from ambient load that would
otherwise read as 236 simultaneous regressions).

Usage:
    python3 tools/bench_budget.py update [bench_full.json]
        regenerate bench_budget.json from a bench artifact
    python3 tools/bench_budget.py check  [bench_full.json]
        compare: a key FAILS when its normalized median exceeds 2x its
        committed budget AND by more than 0.25 normalized seconds (the
        absolute floor keeps 0.1 s keys from flapping on scheduler
        noise). NEW keys (no budget yet) and REMOVED keys are reported
        but only REMOVED fails (a key that vanished from the bench is a
        coverage regression). Exit 1 on any failure.
    python3 tools/bench_budget.py selftest
        seeded-regression self-check: builds a synthetic budget + bench
        pair with one 3x-slowed key and asserts check() catches exactly
        that key.

Close ritual: run `check` beside `PlanCensus --check`; on intended
changes (new keys, faster plans) run `update` and commit the file WITH
the change that moved it.
"""
import json
import os
import sys

BUDGET_PATH = os.path.join(os.path.dirname(__file__), "..", "bench_budget.json")
RATIO = 2.0
ABS_FLOOR = 0.25  # normalized seconds


def load_bench(path):
    with open(path) as f:
        b = json.load(f)
    calib = b.get("calib_1t") or 1.0
    return {k: v["med"] / calib for k, v in b["queries"].items()}, calib


def update(bench_path):
    norm, calib = load_bench(bench_path)
    out = {k: round(v, 3) for k, v in sorted(norm.items())}
    with open(BUDGET_PATH, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"[budget] wrote {len(out)} keys (calib_1t={calib}) to bench_budget.json")


def check_maps(budget, norm):
    """Pure comparison: returns (failed, new, removed) key lists."""
    failed = [k for k, v in norm.items()
              if k in budget and v > budget[k] * RATIO and v - budget[k] > ABS_FLOOR]
    new = sorted(set(norm) - set(budget))
    removed = sorted(set(budget) - set(norm))
    return sorted(failed), new, removed


def check(bench_path):
    with open(BUDGET_PATH) as f:
        budget = json.load(f)
    norm, calib = load_bench(bench_path)
    failed, new, removed = check_maps(budget, norm)
    for k in failed:
        print(f"[budget] FAIL {k}: normalized {norm[k]:.3f} vs budget "
              f"{budget[k]:.3f} ({norm[k]/budget[k]:.1f}x)")
    for k in new:
        print(f"[budget] NEW {k}: normalized {norm[k]:.3f} (no committed budget; "
              "run update with this change)")
    for k in removed:
        print(f"[budget] REMOVED {k}: budgeted but absent from the bench")
    print(f"[budget] {len(norm)} keys checked (calib_1t={calib}): "
          f"{len(failed)} over budget, {len(new)} new, {len(removed)} removed")
    return 1 if (failed or removed) else 0


def selftest():
    budget = {"fast_key": 0.4, "slow_key": 1.0, "tiny_key": 0.05, "gone_key": 0.3}
    norm = {
        "fast_key": 0.5,   # 1.25x: fine
        "slow_key": 3.0,   # 3x AND +2.0s: the seeded regression
        "tiny_key": 0.15,  # 3x but under the absolute floor: noise, fine
        "new_key": 0.2,    # unbudgeted: reported, not failed
    }
    failed, new, removed = check_maps(budget, norm)
    assert failed == ["slow_key"], f"seeded regression not caught: {failed}"
    assert new == ["new_key"], new
    assert removed == ["gone_key"], removed
    print("[budget] selftest OK: seeded 3x key caught, floor and "
          "new/removed classification correct")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    bench = sys.argv[2] if len(sys.argv) > 2 else "bench_full.json"
    if mode == "update":
        update(bench)
    elif mode == "selftest":
        selftest()
    elif mode == "check":
        sys.exit(check(bench))
    else:
        sys.exit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
