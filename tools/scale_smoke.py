"""Scale-up smoke: replicate sf0.1 by N× into /tmp and re-run the bench
headline, checking that per-query time grows ~linearly (no plan cliff:
a broadcast flipping to a blowup, a sort spilling pathologically, etc).

Usage: python tools/scale_smoke.py [factor] [--top N] [--cap SECONDS]

--top N   restrict to the N priciest queries per BENCH_local.json (the
          r11 100× point runs the top quartile; exhaustive stays the
          default for 10×/30×). The selection is recorded in the output
          so a truncated sweep can never read as exhaustive.
--cap S   per-query watchdog at the scaled run: if a query exceeds S
          seconds its jobs are cancelled and it is recorded as a
          CAP_EXCEEDED failure with the elapsed time — a super-linear
          plan surfaces as a flagged entry instead of stalling the
          whole sweep.

Replication multiplies fact tables (lineitem, orders, events, documents,
embeddings) with key-shifted copies so join fan-outs stay realistic
(each copy joins within itself, like extra partitions of the same
logical table). Dimensions stay as-is.

--dense (r13, VERDICT r12 ask #2) switches to DENSITY-PRESERVING
replication: the default mode keeps dimension key spaces and the events
time span fixed, so N× data means N× events per user IN THE SAME time
window, N× orders over the SAME parts, etc. — some queries' OUTPUT then
grows ~N² (stream-stream joins within a horizon, co-occurrence graphs,
near-dup pair mining), and their wall ratio measures output blowup, not
plan scaling. Dense mode keeps every density constant instead: each
copy of events is time-shifted past the previous copy's span and gets
its own user_id namespace; customer/part/supplier key spaces replicate
alongside orders/lineitem (copy i joins copy i's dimensions). That is
the realistic 100-TB shape — more users, more SKUs, a longer history —
and under it a sound plan's wall should scale ~linearly in N even for
the output-quadratic-under-densification queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from shelf_spark.data import TABLES, load_table
from shelf_spark.session import get_spark
from shelf_spark.queries import QUERIES

SRC = "/root/testdata/sf0.1"
FACTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
#: --dense key shifts: every foreign key moves WITH its dimension, so
#: copy i's facts join copy i's dimensions and all per-key densities
#: (orders/customer, lineitems/part, events/user, time density) stay
#: constant as the corpus grows.
DENSE_FACTS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# Exhaustive by construction: smoke the same list bench.py benches (the
# full registry minus its reasoned exclude set). A literal list here
# drifted to 244/340 between r8 and r10 while the documented methodology
# was already exhaustive — deriving from bench.HEADLINE makes that drift
# impossible (tests/test_queries.py pins bench.HEADLINE == registry -
# BENCH_EXCLUDE).
from bench import HEADLINE  # noqa: E402


def replicate(spark, factor: int, dest: str, dense: bool = False) -> None:
    facts = DENSE_FACTS if dense else FACTS
    ts_span_days = None
    if dense:
        # time-shift stride: each events copy starts at least a full day
        # past the previous copy's end, so event-time horizons
        # (stream-stream joins, sessionization gaps) never straddle
        # copies; whole-day intervals add exactly to TIMESTAMP_NTZ
        lohi = load_table(spark, SRC, "events").select(
            F.min("ts"), F.max("ts")
        ).first()
        if lohi[0] is None or lohi[1] is None:
            sys.exit("--dense: events table is empty — no time span to "
                     "shift copies past; use the default densifying mode")
        ts_span_days = (lohi[1].date() - lohi[0].date()).days + 2
    for name in TABLES:
        out = os.path.join(dest, f"{name}.parquet")
        df = load_table(spark, SRC, name)
        if name in facts:
            shift_cols = facts[name]
            copies = []
            # key-shift each copy so keys stay unique but join selectivity
            # per logical row is unchanged
            span = 10_000_000
            for i in range(factor):
                c = df
                for col in shift_cols:
                    c = c.withColumn(col, F.col(col) + F.lit(i * span))
                # documents: tag each copy's vocabulary so copies are NOT
                # verbatim duplicates of each other. Untagged replication
                # multiplies the true near-dup pair count ~factor² (every
                # copy duplicates every other), which measures output
                # growth, not algorithmic scaling — real crawls grow with
                # a roughly constant dup rate, which this preserves.
                if name == "documents" and i > 0:
                    c = c.withColumn(
                        "text",
                        F.array_join(
                            F.transform(
                                F.split(F.col("text"), " "),
                                lambda w: F.concat(w, F.lit(f"~{i}")),
                            ),
                            " ",
                        ),
                    )
                # embeddings: same rationale as the text tagging — apply a
                # per-copy orthogonal reflection (flip a copy-specific
                # pseudo-random half of the dimensions). Within-copy
                # cosines are EXACTLY preserved (reflections are
                # orthogonal), cross-copy cosines collapse toward 0, so
                # the true semantic-dup rate stays constant instead of
                # every copy duplicating every other (~factor² pairs).
                if name == "embeddings" and i > 0:
                    c = c.withColumn(
                        "embedding",
                        F.transform(
                            "embedding",
                            lambda x, j: F.when(
                                F.xxhash64(F.lit(i), j) % 2 == 0, x
                            ).otherwise(-x),
                        ),
                    )
                if dense and name == "events" and i > 0:
                    c = c.withColumn(
                        "ts",
                        F.col("ts")
                        + F.expr(f"INTERVAL {i * ts_span_days} DAY"),
                    )
                copies.append(c)
            df = copies[0]
            for c in copies[1:]:
                df = df.unionAll(c)
            # orders.o_custkey must still hit customer: wrap back into
            # range (default mode only — dense replicates customer with
            # matching shifted keys instead)
            if name == "orders" and not dense:
                n_cust = load_table(spark, SRC, "customer").count()
                df = df.withColumn(
                    "o_custkey", (F.col("o_custkey") % F.lit(n_cust)) + 1
                )
            if name == "events" and not dense:
                # keep user_id cardinality fixed: sessionization load grows
                # per-user, the realistic shape for more traffic
                pass
        df.write.mode("overwrite").parquet(out)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("factor", nargs="?", type=int, default=10)
    ap.add_argument("--top", type=int, default=0,
                    help="restrict to the N priciest queries per BENCH_local.json")
    ap.add_argument("--cap", type=float, default=0,
                    help="per-query watchdog seconds at the scaled run")
    ap.add_argument("--dense", action="store_true",
                    help="density-preserving replication (time-shifted "
                    "events, per-copy user/dimension key namespaces) — "
                    "measures plan scaling for queries whose OUTPUT "
                    "grows super-linearly under the default densifying "
                    "replicas")
    ap.add_argument("--only", default=None, metavar="NAME[,NAME...]",
                    help="restrict to these query names (for targeted "
                    "re-measures; recorded in the output)")
    args = ap.parse_args()
    factor = args.factor
    if args.only and args.top:
        sys.exit("--only and --top are mutually exclusive")

    names = list(HEADLINE)
    if args.only:
        wanted = [n.strip() for n in args.only.split(",") if n.strip()]
        unknown = [n for n in wanted if n not in QUERIES]
        if unknown:
            sys.exit(f"--only: unknown queries {unknown}")
        names = wanted
    if args.top:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_local.json")) as fh:
            rec = json.loads(fh.read().strip().splitlines()[-1])
        if rec.get("contaminated_by"):
            # bench.py no longer writes contaminated records, but refuse
            # an inherited one outright: a busy-box timing record must
            # never drive the top-N selection (r12 ADVICE)
            sys.exit(
                "--top: BENCH_local.json is stamped contaminated_by="
                f"{rec['contaminated_by']}; refresh it on an idle box "
                "with `python bench.py` first")
        ref = rec["queries"]
        ranked = sorted((n for n in names if n in ref), key=lambda n: -ref[n])
        if not ranked:  # a stale/foreign BENCH_local must fail loudly,
            sys.exit(   # not IndexError on an empty selection
                "--top: no HEADLINE query appears in BENCH_local.json; "
                "refresh it with `python bench.py` first")
        names = ranked[: args.top]
        print(f"top-{args.top} selection by BENCH_local.json "
              f"(cutoff {ref[names[-1]]:.3f}s); "
              f"{len(HEADLINE) - len(names)} cheaper queries excluded",
              file=sys.stderr)

    dest = f"/tmp/shelf-scale-{factor}x" + ("-dense" if args.dense else "")
    spark = get_spark("scale-smoke")
    if not os.path.exists(os.path.join(dest, "lineitem.parquet")):
        t0 = time.perf_counter()
        os.makedirs(dest, exist_ok=True)
        replicate(spark, factor, dest, dense=args.dense)
        print(f"replicated {factor}x{' dense' if args.dense else ''} in "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)

    class CapExceeded(Exception):
        def __init__(self, msg: str, runaway: bool = False):
            super().__init__(msg)
            #: True when the cancelled job's thread was still alive after
            #: the post-cancel grace — the session must be recreated or
            #: the runaway keeps executing under the NEXT query's timer
            self.runaway = runaway

    def run_once(name: str, sf_dir: str, cap: float = 0) -> float:
        import threading

        def noop_run():
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

        def capped(budget: float, label: str):
            done = threading.Event()
            err: list[BaseException] = []

            def body():
                try:
                    noop_run()
                except BaseException as e:  # surfaced after join
                    err.append(e)
                finally:
                    done.set()

            t = threading.Thread(target=body, daemon=True)
            t.start()
            if not done.wait(budget):
                spark.sparkContext.cancelAllJobs()
                dead = done.wait(30)
                raise CapExceeded(
                    f"exceeded {budget}s cap ({label} pass)", runaway=not dead
                )
            if err:
                raise err[0]

        if cap:
            # The warm pass gets 2× budget: the first query to touch a
            # fresh replica pays page-cache warming + first shuffle
            # materialization (r12: keep-best tripped the 300 s cap on
            # its COLD pass but ran 176 s steady) — the cap exists to
            # catch super-linear PLANS, which the timed pass measures.
            capped(2 * cap, "warm")
            t0 = time.perf_counter()
            capped(cap, "timed")
        else:
            noop_run()  # warm
            t0 = time.perf_counter()
            noop_run()
        return round(time.perf_counter() - t0, 3)

    results = {}
    failures = []
    for sf_dir, label in ((SRC, "1x"), (dest, f"{factor}x")):
        cap = args.cap if sf_dir == dest else 0
        timings = {}
        def flag_cap(name: str, exc: "CapExceeded") -> None:
            nonlocal spark
            failures.append({"query": name, "scale": label,
                             "error": f"CAP_EXCEEDED: {exc}"})
            print(f"  CAP_EXCEEDED {name} at {label}", file=sys.stderr)
            if exc.runaway:
                # the cancelled job outlived the grace period: a fresh
                # session is the only way to keep it from executing
                # concurrently with the next query's timed run
                print("  runaway job survived cancel — recreating session",
                      file=sys.stderr)
                spark.stop()
                spark = get_spark("scale-smoke")

        for name in names:
            # One retry per query: ~150 queries × 2 scales run >10⁴ jobs
            # in one JVM, and Spark's ContextCleaner can GC an
            # accumulator still referenced by a running stage (observed
            # once late in a full sweep) — transient, not a plan defect.
            try:
                timings[name] = run_once(name, sf_dir, cap)
            except CapExceeded as exc:  # flagged, never retried
                flag_cap(name, exc)
            except Exception:
                try:
                    timings[name] = run_once(name, sf_dir, cap)
                except CapExceeded as exc:
                    flag_cap(name, exc)
                except Exception as exc:  # record, don't abort the sweep
                    failures.append({"query": name, "scale": label,
                                     "error": str(exc)[:200]})
        results[label] = timings
        print(f"{label}: total {sum(timings.values()):.2f}s", file=sys.stderr)
        # Fresh session per scale: resets accumulator/broadcast state so
        # the second pass measures the engine, not session accretion.
        spark.stop()
        spark = get_spark("scale-smoke")

    ratios = {
        n: round(results[f"{factor}x"][n] / max(results["1x"][n], 1e-9), 1)
        for n in names
        if n in results["1x"] and n in results[f"{factor}x"]
    }
    print(json.dumps({"factor": factor,
                      "mode": "dense" if args.dense else "densifying",
                      "selection": (f"only={args.only}" if args.only
                                    else f"top-{args.top}" if args.top
                                    else "exhaustive"),
                      "n_queries": len(names),
                      "cap_seconds": args.cap or None,
                      "timings": results,
                      "ratio": ratios, "failures": failures}))


if __name__ == "__main__":
    main()
