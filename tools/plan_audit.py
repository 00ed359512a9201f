"""Registry-wide physical-plan audit: the 100 TB anti-pattern sweep,
mechanized.

For EVERY registered batch query, builds the DataFrame and checks the
physical plan for the two silent scale-killers this repo has actually
shipped and then fixed (r6: unpartitioned domain windows; r2: an
accidental cartesian in a draft range join):

- **Window nodes with an empty partition spec** — WindowExec moves the
  node's whole input into one task ("No Partition Defined … Moving all
  data to a single partition"). Zero are allowed anywhere: bounded-domain
  windows use the constant-partition idiom (prefix.py), which keeps the
  spec non-empty precisely so this audit and the gate log stay silent.
- **CartesianProduct nodes** — allowed only where the operator IS a
  cross join (`join_cross`).

Streaming queries (``stream_*``) are skipped: building them executes a
real availableNow pass (their plan shapes are pinned in
tests/test_streaming.py instead).

Usage: python tools/plan_audit.py   → one JSON line; exit 1 on findings.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shelf_spark.plans import physical_plan, unpartitioned_window_count  # noqa: E402
from shelf_spark.queries import QUERIES  # noqa: E402
from shelf_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

#: Operators whose semantics ARE a cross product of two scale-bounded or
#: deliberately-tiny relations.
CARTESIAN_OK = {"join_cross"}


def main() -> int:
    spark = get_spark("plan-audit")
    findings: dict[str, list[str]] = {}
    n_checked = 0
    for name, fn in sorted(QUERIES.items()):
        if name.startswith("stream_"):
            continue
        try:
            df = fn(spark, SF_DIR)
        except Exception:
            findings.setdefault(name, []).append(
                "failed to build: " + traceback.format_exc(limit=1).strip()
            )
            continue
        n_checked += 1
        n_upw = unpartitioned_window_count(df)
        if n_upw:
            findings.setdefault(name, []).append(
                f"{n_upw} unpartitioned (single-task) window node(s)"
            )
        if "CartesianProduct" in physical_plan(df) and name not in CARTESIAN_OK:
            findings.setdefault(name, []).append("unexpected CartesianProduct")
    print(
        json.dumps(
            {"checked": n_checked, "skipped_streaming": True, "findings": findings}
        )
    )
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
