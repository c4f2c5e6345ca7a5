#!/usr/bin/env python3
"""Per-key bench-budget gate (r8; close protocol reworked r12) — the TIME
half of the regression story whose SHAPE half is plan_census.json: the
census catches a plan that changed, this catches a plan that kept its
shape but lost its speed (codegen fallback, broadcast demotion at
runtime, an accidentally eager probe).

bench_budget.json commits each key's CALIBRATION-NORMALIZED median
(med_seconds / calib_1t from a settled bench run — the calibration
probe is Bench's fixed single-thread FNV loop, so dividing by it
cancels host-speed drift between sessions; the round-5 finding was a
uniform 1.18x per-query inflation from ambient load that would
otherwise read as 236 simultaneous regressions).

CLOSE PROTOCOL (r12). Four consecutive graded closes breached 28-35
keys each with ZERO confirmed plan regressions — every isolated triage
cleared ambient, per-key min/max spreads ran 2-4x, and the r11 settle
windows disagreed per key by 2-3x in BOTH directions while totals
agreed within 5%. A single shared-host close simply cannot price an
individual key, so the gate now requires TWO-CONSECUTIVE-CLOSE
confirmation: a key HARD-FAILS only when it breaches (2x budget AND
+0.25 normalized seconds) in the CURRENT close AND in the PRIOR close
persisted in bench_prior.json. A single-close breach is a FLAG — first
offense, reported for triage, exit 0 — because one close cannot
distinguish a regression from a wave (replayed on the r8-r11 closes:
single-close breaches 1/0/12/28, two-close confirmations 1 — and that
one key isolated-triaged ambient). A genuine regression persists and
is caught one close later; ambient noise decorrelates between closes
(measured: the r10/r11 breach sets share 1 key of 12/28).

Usage:
    python3 tools/bench_budget.py update [bench_full.json]
        regenerate bench_budget.json from a bench artifact
    python3 tools/bench_budget.py check  [bench_full.json]
        two-consecutive-close gate (see above). Exit 1 on any CONFIRMED
        breach or REMOVED key (vanished from the bench = coverage
        regression). NEW keys (no budget) are reported, not failed.
        Without bench_prior.json, falls back to the strict single-close
        gate (every breach fails).
    python3 tools/bench_budget.py roll   [bench_full.json]
        persist this close's normalized medians to bench_prior.json —
        the close ritual's last step, so the NEXT close confirms
        against this one. Commit the file with the close.
    python3 tools/bench_budget.py selftest
        seeded-regression self-check: a 3x-slowed key present in BOTH
        closes must fail; the same breach in only one close must flag,
        not fail; the no-prior fallback must fail it outright.

Close ritual: run `check` beside `PlanCensus --check`; triage FLAGged
keys with the isolated 6-run recipe (SPARK_GRAFT_ONLY=key
SPARK_GRAFT_RUNS=6, idle machine); on intended changes (new keys,
faster plans) run `update` and commit the file WITH the change that
moved it; finish with `roll`.
"""
import json
import os
import sys

HERE = os.path.dirname(__file__)
BUDGET_PATH = os.path.join(HERE, "..", "bench_budget.json")
PRIOR_PATH = os.path.join(HERE, "..", "bench_prior.json")
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


def roll(bench_path):
    norm, calib = load_bench(bench_path)
    out = {"calib_1t": calib, "source": os.path.basename(bench_path),
           "norm": {k: round(v, 3) for k, v in sorted(norm.items())}}
    with open(PRIOR_PATH, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"[budget] rolled {len(norm)} normalized medians (calib_1t={calib}) "
          "to bench_prior.json — the next close confirms against this one")


def over(budget, norm, k):
    """The per-key breach predicate: 2x budget AND past the absolute floor."""
    v = norm.get(k)
    return (v is not None and k in budget
            and v > budget[k] * RATIO and v - budget[k] > ABS_FLOOR)


def check_maps(budget, norm, prior):
    """Pure comparison. Returns (confirmed, flagged, new, removed):
    confirmed = breaches in the current close ALSO breaching in the prior
    close (prior=None -> every current breach is confirmed: strict
    single-close fallback); flagged = first-offense breaches."""
    breach = [k for k in norm if over(budget, norm, k)]
    if prior is None:
        confirmed, flagged = breach, []
    else:
        confirmed = [k for k in breach if over(budget, prior, k)]
        flagged = [k for k in breach if not over(budget, prior, k)]
    new = sorted(set(norm) - set(budget))
    removed = sorted(set(budget) - set(norm))
    return sorted(confirmed), sorted(flagged), new, removed


def check(bench_path):
    with open(BUDGET_PATH) as f:
        budget = json.load(f)
    norm, calib = load_bench(bench_path)
    prior = None
    if os.path.exists(PRIOR_PATH):
        with open(PRIOR_PATH) as f:
            prior = json.load(f)["norm"]
    confirmed, flagged, new, removed = check_maps(budget, norm, prior)
    for k in confirmed:
        why = (f"breached in TWO consecutive closes (prior {prior[k]:.3f})"
               if prior is not None else
               "no prior close to confirm against (strict single-close gate)")
        print(f"[budget] FAIL {k}: normalized {norm[k]:.3f} vs budget "
              f"{budget[k]:.3f} ({norm[k]/budget[k]:.1f}x) — {why}")
    for k in flagged:
        pv = prior.get(k)
        ps = f"{pv:.3f}" if pv is not None else "absent"
        print(f"[budget] FLAG {k}: normalized {norm[k]:.3f} vs budget "
              f"{budget[k]:.3f} ({norm[k]/budget[k]:.1f}x) — first offense "
              f"(prior close {ps}); triage isolated, fails NEXT close if it persists")
    for k in new:
        print(f"[budget] NEW {k}: normalized {norm[k]:.3f} (no committed budget; "
              "run update with this change)")
    for k in removed:
        print(f"[budget] REMOVED {k}: budgeted but absent from the bench")
    mode = "two-close" if prior is not None else "single-close (no bench_prior.json)"
    print(f"[budget] {len(norm)} keys checked (calib_1t={calib}, {mode}): "
          f"{len(confirmed)} confirmed over budget, {len(flagged)} flagged, "
          f"{len(new)} new, {len(removed)} removed")
    return 1 if (confirmed or removed) else 0


def selftest():
    budget = {"fast_key": 0.4, "slow_key": 1.0, "tiny_key": 0.05,
              "gone_key": 0.3, "wave_key": 0.6, "healed_key": 0.5}
    norm = {
        "fast_key": 0.5,    # 1.25x: fine
        "slow_key": 3.0,    # 3x AND +2.0s in BOTH closes: the seeded regression
        "tiny_key": 0.15,   # 3x but under the absolute floor: noise, fine
        "new_key": 0.2,     # unbudgeted: reported, not failed
        "wave_key": 1.5,    # 2.5x NOW but fine in the prior close: first offense
        "healed_key": 0.45, # breached in the prior close, fine now: pass
    }
    prior = {
        "fast_key": 0.41, "slow_key": 2.9, "tiny_key": 0.05,
        "wave_key": 0.55, "healed_key": 1.8,
    }
    confirmed, flagged, new, removed = check_maps(budget, norm, prior)
    assert confirmed == ["slow_key"], f"seeded 2-close regression not caught: {confirmed}"
    assert flagged == ["wave_key"], f"first-offense wave misclassified: {flagged}"
    assert new == ["new_key"], new
    assert removed == ["gone_key"], removed
    # no-prior fallback: strict single-close — the wave fails too
    confirmed1, flagged1, _, _ = check_maps(budget, norm, None)
    assert confirmed1 == ["slow_key", "wave_key"], confirmed1
    assert flagged1 == [], flagged1
    print("[budget] selftest OK: seeded 3x key caught in both modes, "
          "first-offense wave flags (two-close) / fails (fallback), healed "
          "key passes, floor and new/removed classification correct")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    bench = sys.argv[2] if len(sys.argv) > 2 else "bench_full.json"
    if mode == "update":
        update(bench)
    elif mode == "roll":
        roll(bench)
    elif mode == "selftest":
        selftest()
    elif mode == "check":
        sys.exit(check(bench))
    else:
        sys.exit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
