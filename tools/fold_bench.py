"""Fold one or more fresh bench passes into BENCH_BEST.json.

Usage:
    python tools/fold_bench.py pass1.json [pass2.json ...] \
        --reset q1,q2,...  --note "pass description"

Rules (settled round 12/13):
  * every query's committed number is the MIN across clean recorded
    passes — monotone by construction;
  * queries named in ``--reset`` (code reworked since the last fold)
    take their minima from THE GIVEN PASSES ONLY, so every committed
    number measures the shipped code;
  * strict-subset exception (settled late round 13): a change with a
    machine-checkable proof that it only REMOVES driver-side jobs from
    the measured path — identical query plans, per-query job count
    strictly non-increasing, zero executor-side change — does not
    invalidate prior minima (the shipped code on the window that
    produced a minimum would have run at least as fast), so it needs
    no reset.  The proof (job-count A/B per representative query) must
    be recorded in the round log; anything short of that proof resets.
  * each input file is a ``bench.py`` BENCH_FULL-style dict
    (``queries`` map; optional load_avg fields) or a
    ``tools/minibench.py`` output (``queries_min`` map).
"""

from __future__ import annotations

import argparse
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEST = os.path.join(ROOT, "BENCH_BEST.json")


def _queries(d: dict) -> dict:
    if "queries_min" in d:
        return d["queries_min"]
    return d["queries"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("passes", nargs="+")
    ap.add_argument("--reset", default="")
    ap.add_argument("--note", default="")
    args = ap.parse_args()
    reset = {q for q in args.reset.split(",") if q}

    best = json.load(open(BEST))
    cur = best["queries"]
    fresh: dict[str, float] = {}
    for path in args.passes:
        d = json.load(open(path))
        for q, t in _queries(d).items():
            fresh[q] = min(fresh.get(q, t), t)
        entry = {
            "pass": len(best["pass_loads"]) + 1,
            "total": d.get("value"),
            "n_queries": len(_queries(d)),
        }
        for k in ("load_avg_start", "load_avg_end"):
            if k in d:
                entry[k] = d[k]
        if d.get("retried") is not None:
            entry["n_retried"] = len(d["retried"])
        if args.note:
            entry["note"] = args.note
        best["pass_loads"].append(entry)

    missing_reset = reset - set(fresh)
    if missing_reset:
        raise SystemExit(
            f"--reset queries absent from the given passes: {sorted(missing_reset)}"
        )
    for q, t in fresh.items():
        if q in reset or q not in cur:
            cur[q] = t if q in reset else min(t, cur.get(q, t))
        else:
            cur[q] = min(cur[q], t)
    for q in reset:
        cur[q] = fresh[q]

    best["value"] = round(sum(cur.values()), 3)
    best["runs_merged"] = len(best["pass_loads"])
    json.dump(best, open(BEST, "w"), indent=None)
    print(
        f"folded {len(args.passes)} pass(es); reset {len(reset)} queries; "
        f"best_of_total = {best['value']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
