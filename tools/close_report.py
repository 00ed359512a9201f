"""Generate the canonical close-out one-liner from the artifacts.

Round-8 verdict flagged registry/bench/gate numbers drifting across
README, SCALE.md and commit messages because they were typed by hand.
This emits the only sanctioned close-out strings — paste its output,
never retype it.

Usage:
    python tools/close_report.py [--gate-log FILE]

Sources (all read, none computed fresh — this is a REPORTER):
- registry count / oracle count: live import of shelf_spark.queries
- driver window: live import of __spark_entry__ (first 50 of queries())
- bench: BENCH_local.json (written by `python bench.py`)
- gate tally: the summary line of the latest full check_correctness log
  (pass --gate-log; defaults to /tmp/gate_r9_full.log if present)
- pytest: the last line of /tmp/pytest_r9.log if present
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate-log", default="/tmp/gate_r9_full.log")
    ap.add_argument("--pytest-log", default="/tmp/pytest_r9.log")
    args = ap.parse_args()

    from shelf_spark.queries import ORACLES, QUERIES

    import __spark_entry__ as entry

    window = list(entry.queries())[:50]
    parts = [
        f"registry {len(QUERIES)} queries ({len(ORACLES)} value-exact oracles, "
        f"{len(QUERIES) - len(ORACLES)} rows-only)",
        f"driver window 50/50 oracled={all(n in ORACLES for n in window)}",
    ]

    if os.path.exists("BENCH_local.json"):
        with open("BENCH_local.json") as fh:
            b = json.loads(fh.readline())
        parts.append(
            f"bench {b['value']:.1f} s over {b['n_queries']} queries "
            f"at sf{b['sf']} ({b.get('methodology', '?')})"
        )

    for label, path, pat in (
        ("gate", args.gate_log,
         r"(\d+) ok, (\d+) rows-only, (\d+) FAIL of (\d+)"),
        ("pytest", args.pytest_log,
         r"(\d+) passed(?:, (\d+) deselected)?"),
    ):
        if not os.path.exists(path):
            parts.append(f"{label} ?(no log at {path})")
            continue
        with open(path) as fh:
            text = fh.read()
        hits = re.findall(pat, text)
        if hits:
            last = hits[-1]
            if label == "gate":
                parts.append(
                    f"gate {last[0]} ok + {last[1]} rows-only, "
                    f"{last[2]} FAIL of {last[3]}"
                )
            else:
                desel = f" + {last[1]} deselected" if last[1] else ""
                parts.append(f"pytest {last[0]} passed{desel}")
        else:
            parts.append(f"{label} ?(no summary in {path})")

    print("; ".join(parts))
    return 0


if __name__ == "__main__":
    sys.exit(main())
