"""Generate the canonical close-out lines from the artifacts.

Round-8 verdict flagged registry/bench/gate numbers drifting across
README, SCALE.md and commit messages because they were typed by hand.
This emits the only sanctioned close-out strings — paste its output,
never retype it.

Usage:
    python tools/close_report.py [--gate-log LABEL=FILE ...]

Sources (all read, none computed fresh — this is a REPORTER):
- registry count / oracle count: live import of shelf_spark.queries
- driver window: live import of __spark_entry__ (first 50 of queries())
- bench: BENCH_local.json (written by `python bench.py`), including the
  explicit exclusion list (registry entries the headline loop cannot
  bench and why) so a bench-vs-registry count delta never reads as drift
- gate tallies: the summary line of each check_correctness log given via
  --gate-log (repeatable; the five-corpus ritual passes five). With no
  flag, the five canonical r10 log paths are probed.
- pytest: the last line of --pytest-log
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: The six-corpus verify ritual's canonical log locations (gate §2/2c/2d
#: of .claude/skills/verify/SKILL.md). Overridable via --gate-log.
DEFAULT_GATE_LOGS = [
    ("sf0.001", "/tmp/gate_sf0001.log"),
    ("sf0.01", "/tmp/gate_sf001.log"),
    ("sf0.1", "/tmp/gate_sf01.log"),
    ("adversarial", "/tmp/gate_adv.log"),
    ("sparse", "/tmp/gate_sparse.log"),
    ("skewed", "/tmp/gate_skewed.log"),
    ("empty", "/tmp/gate_empty.log"),
    ("nulls", "/tmp/gate_nulls.log"),
    ("unicode", "/tmp/gate_unicode.log"),
    ("time", "/tmp/gate_time.log"),
]

_GATE_PAT = r"(\d+) ok, (\d+) rows-only, (\d+) FAIL of (\d+)"
_PYTEST_PAT = r"(\d+) passed(?:, (\d+) deselected)?"


def _gate_line(label: str, path: str) -> str:
    if not os.path.exists(path):
        return f"gate[{label}] ?(no log at {path})"
    with open(path) as fh:
        hits = re.findall(_GATE_PAT, fh.read())
    if not hits:
        return f"gate[{label}] ?(no summary in {path})"
    ok, ro, fail, tot = hits[-1]
    return f"gate[{label}] {ok} ok + {ro} rows-only, {fail} FAIL of {tot}"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--gate-log", action="append", default=None, metavar="LABEL=FILE",
        help="a check_correctness log to summarize; repeat for the "
        "five-corpus ritual (default: the five canonical /tmp paths)",
    )
    ap.add_argument(
        "--pytest-log", default=None,
        help="pytest log to summarize (default: the newest "
        "/tmp/pytest_r*.log — a fixed round default went stale twice)",
    )
    ap.add_argument(
        "--allow-busy", action="store_true",
        help="skip the idle-box assertion (ONLY for summarizing historical "
        "logs while unrelated work runs)",
    )
    args = ap.parse_args()

    # Close-ritual guard (r12, VERDICT r11 ask #4): the r11 round was
    # closed with a 64 GB background job still in flight, corrupting the
    # official bench artifact. Assert the box is idle before blessing a
    # close-out.
    from bench import _foreign_jvms

    busy = _foreign_jvms()
    if busy and not args.allow_busy:
        sys.exit(
            "close_report: foreign JVM(s) still running — finish or kill "
            "them before closing the round (or pass --allow-busy):\n  "
            + "\n  ".join(busy[:5])
        )

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
        if b.get("contaminated_by") and not args.allow_busy:
            # bench.py no longer writes contaminated records; refuse an
            # inherited one rather than blessing a busy-box close-out
            # (r12 ADVICE)
            sys.exit(
                "close_report: BENCH_local.json is stamped contaminated_by="
                f"{b['contaminated_by']}; re-run `python bench.py` idle")
        parts.append(
            f"bench {b['value']:.1f} s over {b['n_queries']} queries "
            f"at sf{b['sf']} ({b.get('methodology', '?')})"
        )
        # Explicit exclusion list: the headline loop benches every
        # registry entry it can drive through a noop sink; name what it
        # cannot, so 340-vs-341 never reads as drift.
        benched = set(b.get("queries", ()))
        excluded = sorted(set(QUERIES) - benched) if benched else []
        if excluded:
            try:
                from bench import BENCH_EXCLUDE as declared
            except Exception:
                declared = set()
            parts.append(
                f"bench excludes {len(excluded)}: "
                + ", ".join(
                    f"{n} ("
                    + (
                        "declared in bench.BENCH_EXCLUDE - see its inline rationale"
                        if n in declared
                        else "NOT declared - investigate"
                    )
                    + ")"
                    for n in excluded
                )
            )
        elif benched:
            parts.append("bench excludes 0 (full registry benched)")

    gate_logs = []
    for item in args.gate_log or []:
        label, _, path = item.rpartition("=")
        gate_logs.append((label or os.path.basename(path), path))
    if not gate_logs:
        gate_logs = DEFAULT_GATE_LOGS
    for label, path in gate_logs:
        parts.append(_gate_line(label, path))

    if args.pytest_log is None:
        import glob

        # Prefer the highest round number in the filename — mtime alone
        # can pick a stale prior-round log that was merely touched later
        # (r13 ADVICE); mtime breaks ties / non-numeric names.
        def _round_key(p):
            m = re.search(r"pytest_r(\d+)", os.path.basename(p))
            return (int(m.group(1)) if m else -1, os.path.getmtime(p))

        cands = sorted(glob.glob("/tmp/pytest_r*.log"), key=_round_key)
        args.pytest_log = cands[-1] if cands else "/tmp/pytest.log"
        parts.append(f"pytest log auto-selected: {args.pytest_log}")
    if os.path.exists(args.pytest_log):
        with open(args.pytest_log) as fh:
            hits = re.findall(_PYTEST_PAT, fh.read())
        if hits:
            n, desel = hits[-1]
            parts.append(
                f"pytest {n} passed" + (f" + {desel} deselected" if desel else "")
            )
        else:
            parts.append(f"pytest ?(no summary in {args.pytest_log})")
    else:
        parts.append(f"pytest ?(no log at {args.pytest_log})")

    print(";\n".join(parts))
    return 0


if __name__ == "__main__":
    sys.exit(main())
