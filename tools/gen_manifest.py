#!/usr/bin/env python
"""Regenerate MANIFEST.md — the authoritative list of every query the
catalog registers, so the driver/judge can diff their coverage against
the registry instead of discovering it implicitly.

Usage: PYTHONPATH=. python tools/gen_manifest.py
"""

from __future__ import annotations


def main() -> int:
    from dvh_airflow_kafka_spark.catalog import REGISTRY

    oracled = [n for n, q in REGISTRY.items() if q.sql is not None]
    rows_only = [n for n, q in REGISTRY.items() if q.sql is None]
    lines = [
        "# Query manifest\n",
        "Auto-generated from `dvh_airflow_kafka_spark.catalog.REGISTRY` "
        "(`PYTHONPATH=. python tools/gen_manifest.py`). Every name below is "
        "returned by `__spark_entry__.queries()`; names in the ORACLED "
        "section also have a DuckDB oracle in `oracle_sql()` and must be "
        "hash-checked; ROWS-ONLY names are the non-SQL-expressible "
        "seeded-hash ops (LSH/ANN internals) whose semantics are "
        "pytest-verified instead.\n",
        f"Total: **{len(REGISTRY)}** queries — {len(oracled)} oracled, "
        f"{len(rows_only)} rows-only.\n",
        f"## Oracled ({len(oracled)})\n",
    ]
    lines += [f"{i + 1}. `{n}`" for i, n in enumerate(sorted(oracled))]
    lines += ["", f"## Rows-only ({len(rows_only)})\n"]
    lines += [f"{i + 1}. `{n}`" for i, n in enumerate(sorted(rows_only))]
    lines.append("")
    with open("MANIFEST.md", "w") as f:
        f.write("\n".join(lines))
    print(f"MANIFEST.md: {len(REGISTRY)} queries ({len(oracled)} oracled)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
