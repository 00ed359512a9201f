"""Headline benchmark: runs representative queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once to warm (absorbs whole-stage-codegen JIT
compilation, ~0.5s per novel plan shape — a fixed driver-side cost that is
noise at production scale) and then timed as the MEDIAN of three
steady-state runs (a single run is fragile: one GC pause or a neighbor
process polluted the r02 numbers by +23%). Materialization is forced via
df.write.format("noop") — full execution, no driver-side collect of the
payload.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shelf_spark.queries import QUERIES  # noqa: E402
from shelf_spark.session import get_spark  # noqa: E402

#: Bench set: the FULL registry, minus an explicit exclude list with
#: reasons — exhaustive by construction, so bench coverage can never
#: silently lag the registry again (through r8 this was a curated
#: representatives list; it had drifted to 225 of 340).
BENCH_EXCLUDE = {
    # correctness-harness configuration, not a scale path: codebook cap
    # lifted past the corpus size makes the PQ pipeline quadratic in the
    # corpus BY DESIGN (ADC == exact L2^2); the real quantizer
    # ann_pq_topk is benched instead
    "ann_pq_exhaustive_adc",
}

HEADLINE = [n for n in QUERIES if n not in BENCH_EXCLUDE]


def _foreign_jvms() -> list[str]:
    """Live JVMs on the box (pid: cmdline). At guard time this process has
    not started its own JVM yet, so ANY hit is a foreign load source.

    Close-ritual guard (r12, VERDICT r11 ask #4): BENCH_r11.json was
    captured while a 64 GB-heap 100× re-run was still in flight, inflating
    the official number ~38% — the guard lives in the tool now, not in
    prose."""
    import glob

    out = []
    for p in glob.glob("/proc/[0-9]*/cmdline"):
        try:
            with open(p, "rb") as fh:
                cmd = fh.read().replace(b"\0", b" ").decode(errors="replace")
        except OSError:
            continue
        head = cmd.split(" ", 1)[0]
        if head == "java" or head.endswith("/java"):
            out.append(f"{p.split('/')[2]}: {cmd[:160].strip()}")
    return out


def _await_idle_box(grace_sec: int = 180) -> list[str]:
    """Wait up to grace_sec for foreign JVMs to drain; return survivors."""
    deadline = time.monotonic() + grace_sec
    jvms = _foreign_jvms()
    while jvms and time.monotonic() < deadline:
        print(
            f"# waiting for {len(jvms)} foreign JVM(s) to exit before "
            f"timing: {jvms[0]}",
            file=sys.stderr,
        )
        time.sleep(10)
        jvms = _foreign_jvms()
    return jvms


def _run_one(spark, name: str, sf_dir: str) -> float:
    """Median-of-3 steady-state wall for one query (after a warm pass)."""
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def main() -> None:
    import argparse
    import gc

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--pattern", default=None, help="regex filter over headline names "
        "(two-speed workflow: iterate on one family fast)"
    )
    ap.add_argument(
        "--session-every", type=int, default=0, metavar="N",
        help="restart the SparkContext every N queries (0 = one session; "
        "isolation mode for measuring serial-session state accumulation)",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # Idle-box guard: wait for foreign JVMs to drain; if any survive the
    # grace window, proceed (the artifact must still land) but stamp the
    # contamination into the JSON so the number can never silently read
    # as a steady-state measurement.
    contaminated_by = _await_idle_box()
    if contaminated_by:
        print(
            f"# WARNING: timing alongside {len(contaminated_by)} foreign "
            f"JVM(s) — output will carry 'contaminated_by'",
            file=sys.stderr,
        )

    spark = get_spark("shelf-spark-bench")
    timings: dict[str, float] = {}
    names = [n for n in HEADLINE if n in QUERIES]
    if args.pattern:
        pat = re.compile(args.pattern)
        names = [n for n in names if pat.search(n)]
    for i, name in enumerate(names):
        if args.session_every and i and i % args.session_every == 0:
            spark.stop()
            spark = get_spark("shelf-spark-bench")
        # One retry: Spark's ContextCleaner can GC an accumulator still
        # referenced by a running stage late in a long serial session
        # (same transient scale_smoke.py guards against) — retry once
        # before letting a real failure surface.
        try:
            timings[name] = _run_one(spark, name, sf_dir)
        except Exception:
            timings[name] = _run_one(spark, name, sf_dir)
        # Release py4j refs promptly so the JVM ContextCleaner can drop
        # finished localCheckpoint blocks / broadcasts; a JVM GC nudge
        # every 10 queries bounds long-serial-session block accumulation
        # without paying a full GC per query.
        gc.collect()
        if i % 10 == 9:
            spark.sparkContext._jvm.System.gc()

    base = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": sf,
        # Methodology marker: r01–r03 were single-run timings; r04+
        # are median-of-3 after a warm pass. Cross-round totals are
        # comparable only within the same methodology and headline
        # set — compare per-query, not totals, across rounds.
        "methodology": "median-of-3-after-warm",
        "n_queries": len(timings),
    }
    if contaminated_by:
        base["contaminated_by"] = contaminated_by[:5]
    # Durable FULL per-query record, committed in-repo (the driver
    # captures stdout with a bounded tail window). Only a full
    # default-methodology run may overwrite it — a --pattern subset or a
    # --session-every isolation run would clobber the steady-state
    # record with different-methodology timings.
    _default_sf = "/root/testdata/sf0.1"
    try:
        _is_default_sf = os.path.realpath(sf_dir) == os.path.realpath(_default_sf)
    except OSError:
        _is_default_sf = sf_dir == _default_sf
    _record_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH_local.json")
    _is_ritual = os.environ.get("SPARK_GRAFT_BENCH_RITUAL") == "1"
    if (not args.pattern and not args.session_every and _is_default_sf
            and contaminated_by):
        # A run that survived the grace window but saw foreign JVMs must
        # not become the steady-state record (scale_smoke --top and
        # close_report also refuse a contaminated_by-stamped record, as
        # defense-in-depth for readers predating this write guard —
        # r12 ADVICE). Print-only.
        print(
            "# BENCH_local.json not updated: run contaminated by "
            f"{contaminated_by[:3]}",
            file=sys.stderr,
        )
    elif not args.pattern and not args.session_every and _is_default_sf:
        # Overwrite policy (r13 VERDICT ask #5): the durable committed
        # record is the builder's idle-ritual capture. A clean full run
        # WITHOUT the ritual stamp (e.g. the driver's per-round harness
        # bench) must not replace a stamped idle-ritual record — set
        # SPARK_GRAFT_BENCH_RITUAL=1 for the intentional close-of-round
        # refresh. An unstamped existing record (or none) is fair game,
        # so a fresh clone still bootstraps.
        _prior_ritual = False
        try:
            with open(_record_path) as fh:
                _prior_ritual = (json.loads(fh.read().strip().splitlines()[-1])
                                 .get("captured") == "idle-ritual")
        except (OSError, ValueError, IndexError):
            pass
        if _prior_ritual and not _is_ritual:
            print(
                "# BENCH_local.json not updated: existing record is an "
                "idle-ritual capture; set SPARK_GRAFT_BENCH_RITUAL=1 to "
                "intentionally replace it",
                file=sys.stderr,
            )
        else:
            if _is_ritual:
                base["captured"] = "idle-ritual"
            with open(_record_path, "w") as fh:
                fh.write(json.dumps({**base, "queries": timings}) + "\n")
    elif not args.pattern and not args.session_every:
        print(
            f"# BENCH_local.json not updated: sf_dir {sf_dir!r} is not the "
            f"canonical {_default_sf!r}",
            file=sys.stderr,
        )
    # The driver's stdout capture holds ~2.5 KB (evidence: the r6
    # 39-query JSON (~1.4 KB) parsed; the r7 85-query JSON (~2.9 KB)
    # came back head-truncated, parsed:null). Keep the printed line
    # safely under that: per-query map restricted to the slowest 40
    # (everything >=~0.3 s — the entries that carry signal), full map
    # in BENCH_local.json.
    top = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:40])
    payload = json.dumps(
        {
            **base,
            "queries": top,
            "note": (
                f"'queries' shows only the slowest {len(top)} of "
                f"{len(timings)} benched queries (driver stdout cap); "
                "the full per-query map is in BENCH_local.json"
            ),
            "queries_omitted_below": round(min(top.values()), 3) if top else 0,
            "queries_full": "BENCH_local.json",
        }
    )
    # Stop Spark BEFORE printing so shutdown chatter cannot trail (or, via
    # \r-fragments, prefix) the one JSON line the driver parses; the
    # leading newline guards against any pending unterminated \r output.
    spark.stop()
    sys.stdout.write("\n" + payload + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
