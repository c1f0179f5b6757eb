#!/usr/bin/env python
"""Audit the physical plan of every catalog query and write PLANS.md.

For each registered query: counts of shuffle exchanges, join strategies,
windows, aggregates, Python stages (Arrow/pandas), and whole-stage
codegen spans — the at-a-glance evidence that a plan is the one you'd
want at 100 TB (broadcast dimensions, bounded shuffles, no
nested-loop joins, Python only where a kernel genuinely needs it).

Usage: PYTHONPATH=. python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

COUNTERS = {
    "shuffles": r"Exchange hashpartitioning",
    "bcast_join": r"BroadcastHashJoin",
    "smj": r"SortMergeJoin",
    "nested_loop": r"BroadcastNestedLoopJoin|CartesianProduct",
    "window": r"\bWindow\b|WindowExec|WindowGroupLimit",
    "py_stage": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|BatchEvalPython",
    "codegen": r"WholeStageCodegen",
}


def main() -> int:
    from dvh_airflow_kafka_spark.catalog import REGISTRY
    from dvh_airflow_kafka_spark.session import get_spark

    spark = get_spark("plan_audit")
    lines = [
        "# Physical-plan audit\n",
        f"Every catalog query's EXECUTED plan at `{SF_DIR}` — each query "
        "runs to a noop sink first, so the counts reflect the final "
        "adaptive (AQE) plan including realized WholeStageCodegen spans, "
        "not the pre-execution sketch. Counts are DISTINCT physical nodes "
        "(identical plan lines dedup'd): a persisted frame's cached lineage "
        "is re-printed at every InMemoryTableScan site but its exchanges "
        "execute exactly once, at cache fill. "
        "`py_stage` > 0 only where a Python kernel "
        "is the point (pandas UDF vector math, mapInPandas decode, "
        "stateful sessionization). `nested_loop` > 0 only for the "
        "scalar-subquery pattern — a crossJoin against a broadcast "
        "**1-row** aggregate (global min/max, global avg), which is "
        "O(n·1) — plus `event_lag_correlation`'s 13-row lag frame against "
        "the calendar-bounded hourly counts, O(13·|hours|), and the "
        "ddsketch readouts' 3-row percentile frame against the bounded "
        "bucket histogram; no query "
        "nested-loops two data-sized inputs. "
        "Iterative ops that truncate lineage per round (eager "
        "localCheckpoint — `link_graph_kcore`) surface only their FINAL "
        "job's nodes here; their per-round exchanges run inside the "
        "checkpoint jobs and are bounded by construction (see the "
        "`ext/graph` docstrings). `markov_attribution_removal`'s, "
        "`user_churn_kaplan_meier`'s, `shapley_attribution`'s and the "
        "GD trainers' (`linear_probe_gd`, `quality_logreg_gd`) rows "
        "reflect their returned local "
        "frames — the distributed aggregation jobs run upstream of the "
        "bounded collects (see their docstrings).\n",
        "| query | shuffles | bcast_join | smj | nested_loop | window "
        "| py_stage | codegen | oracle |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    totals: dict[str, int] = {k: 0 for k in COUNTERS}
    for name, qd in sorted(REGISTRY.items()):
        try:
            df = qd.fn(spark, SF_DIR)
            # Execute THIS DataFrame's own QueryExecution (collect, not a
            # writer, which clones the plan) so AQE finalizes it —
            # pre-execution adaptive plans print no codegen info at all,
            # which made the audit report codegen=0 everywhere.
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover
            lines.append(f"| {name} | (error: {type(exc).__name__}) |" + " |" * 8)
            continue
        # Count DISTINCT matching plan lines, not raw occurrences: the plan
        # string re-prints a persisted frame's full cached lineage at every
        # InMemoryTableScan site, so raw counts charge a cache-filling
        # shuffle once per scan even though it executes exactly once.
        # Expression ids are globally unique per attribute, so two
        # identical `Exchange hashpartitioning(k#12, 32)` lines are the
        # same physical node; genuinely distinct exchanges always differ.
        # (Reused exchanges print as ReusedExchange and never match.)
        plan_lines = [re.sub(r"^[\s:+-]+", "", ln) for ln in plan.splitlines()]
        counts = {
            k: len({ln for ln in plan_lines if re.search(rx, ln)})
            for k, rx in COUNTERS.items()
        }
        # finalized AQE plans mark codegen stages as `*(id)` prefixes, not
        # WholeStageCodegen nodes — count distinct stage ids
        counts["codegen"] = max(
            counts["codegen"], len(set(re.findall(r"\*\((\d+)\)", plan)))
        )
        for k, v in counts.items():
            totals[k] += v
        oracle = "sql" if qd.sql else "rows-only"
        lines.append(
            f"| {name} | " + " | ".join(str(counts[k]) for k in COUNTERS)
            + f" | {oracle} |"
        )
    lines.append(
        "\nTotals: "
        + ", ".join(f"{k}={v}" for k, v in totals.items())
        + f" across {len(REGISTRY)} queries."
    )
    with open("PLANS.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote PLANS.md ({len(REGISTRY)} queries)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
