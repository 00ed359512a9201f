"""Plan diagnostics for any registered query: the would-this-survive-100×
checklist (pushdown, read schema, exchanges, join strategies, codegen
spans) in one place.

Usage:
    python tools/explain_query.py <name> [--sf DIR] [--full]
    python tools/explain_query.py --all          # one summary line each
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from shelf_spark.plans import (  # noqa: E402
    broadcast_join_count,
    codegen_ids,
    exchange_count,
    formatted_plan,
    physical_plan,
    scans_of,
)
from shelf_spark.queries import QUERIES  # noqa: E402
from shelf_spark.session import get_spark  # noqa: E402


def summarize(df) -> dict:
    plan = physical_plan(df)
    return {
        "exchanges": exchange_count(df),
        "broadcast_joins": broadcast_join_count(df),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "scans": len(scans_of(df)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="?", help="query name (see --all)")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--full", action="store_true", help="print the formatted plan")
    ap.add_argument("--all", action="store_true", help="summary line per query")
    args = ap.parse_args()

    spark = get_spark("explain")
    if args.all:
        for name, fn in QUERIES.items():
            try:
                s = summarize(fn(spark, args.sf))
                flags = []
                if s["cartesian"]:
                    flags.append("CARTESIAN")
                if s["exchanges"] > 4:
                    flags.append(f"{s['exchanges']}x-shuffle")
                print(
                    f"{name:35s} exch={s['exchanges']} bcast={s['broadcast_joins']}"
                    f" smj={s['sortmerge_joins']} scans={s['scans']}"
                    + ("  ⚠ " + ",".join(flags) if flags else "")
                )
            except Exception as e:  # streaming / stateful entries
                print(f"{name:35s} (not plannable statically: {type(e).__name__})")
        return

    if not args.name or args.name not in QUERIES:
        sys.exit(f"unknown query; choose from: {', '.join(QUERIES)}")
    df = QUERIES[args.name](spark, args.sf)
    for k, v in summarize(df).items():
        print(f"{k:18s} {v}")
    for i, s in enumerate(scans_of(df)):
        print(f"scan[{i}] pushed={s.pushed_filters or '[]'}")
        print(f"        schema={s.read_schema}")
    print(f"codegen_spans      {len(codegen_ids(df))}")
    if args.full:
        print(formatted_plan(df))


if __name__ == "__main__":
    main()
