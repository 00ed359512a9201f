"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same Parquet tables, then compares row count, column
names, and order-insensitive values (floats with tolerance). Lets us know
CORRECTNESS_r{N}.json before the driver does.

Usage:
    python tools/check_correctness.py [name-regex] [--sf DIR] [--workers N]

``--workers N`` shards the query list round-robin over N subprocesses,
each with its own SparkSession (local[32/N]) and DuckDB connection — the
queries are independent, so this is a sound wall-clock divider (unlike a
result cache, it never skips anything). The full no-filter sweep remains
the pre-driver ritual; ``--changed-since`` remains the iteration filter.
"""

from __future__ import annotations

import argparse
import math
import re
import sys
import time
from datetime import date, datetime

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from shelf_spark.data import TABLES, table_path  # noqa: E402
from shelf_spark.queries import ORACLES, QUERIES  # noqa: E402
from shelf_spark.session import get_spark  # noqa: E402

#: Queries that legitimately emit 0 rows on the tiniest corpus (sf0.001),
#: each mapped to the value-exact twin that proves the same machinery on
#: real rows. A VACUOUS result for a key passes only if its twin was
#: non-vacuous in the same sweep (r13 VERDICT ask #6).
VACUOUS_TWINS = {
    "join_anti": "join_anti_survivors",
    "dedup_semantic_clusters": "dedup_semantic_clusters_t40",
}


def _norm_cell(v):
    """Normalize a cell for order-insensitive comparison."""
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        # EXACT comparison (bitwise, modulo -0.0): the driver hashes values,
        # so queries must produce identical doubles on both engines.
        return ("f", v + 0.0 if v != 0 else 0.0)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", int(v))
    if isinstance(v, datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_norm_cell(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v).hex())
    return ("s", str(v))


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


#: Worker-summary parser. The optional "(N unexplained-vacuous)" suffix
#: (r13 advice gate) must be tolerated: before r14 a shard that reported
#: any unexplained-vacuous rows was silently DROPPED from the merged
#: totals (the sf0.001 merge printed "254 ... of 257" for a 343-query
#: run), and a hostile-corpus run where every shard carried the suffix
#: merged to "0 ok of 0". The vacuous count is also surfaced in the
#: merged line now so the signal is not lost in the fan-out path.
_SUMMARY_RE = re.compile(
    r"^(\d+) ok, (\d+) rows-only, (\d+) FAIL of (\d+)"
    r"(?: \((\d+) unexplained-vacuous\))?$"
)


def _run_workers(args) -> int:
    """Fan the gate out over N subprocesses and merge their summaries.

    Round-robin sharding spreads the expensive queries (which cluster by
    module, hence by registry position) across workers; each worker gets
    32/N Spark threads so the host is never oversubscribed.
    """
    import os
    import subprocess

    n = args.workers
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(max(4, 32 // n))
    procs = []
    for i in range(n):
        cmd = [sys.executable, __file__, args.pattern, "--sf", args.sf,
               "--shard", f"{i}/{n}"]
        if args.changed_since:
            cmd += ["--changed-since", args.changed_since]
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True,
        ))
    tot = [0, 0, 0, 0, 0]
    failures: list[str] = []
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate()
        rc |= p.returncode
        for line in out.splitlines():
            m = _SUMMARY_RE.match(line)
            if m:
                for j in range(5):
                    tot[j] += int(m.group(j + 1) or 0)
            elif line.startswith("failures:"):
                failures += line.split()[1:]
            elif line and not line.startswith("#"):
                print(f"[w{i}] {line}")
    vac = f" ({tot[4]} unexplained-vacuous)" if tot[4] else ""
    print(f"\n{tot[0]} ok, {tot[1]} rows-only, {tot[2]} FAIL of {tot[3]} "
          f"({n} workers){vac}")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if (rc or tot[2]) else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("pattern", nargs="?", default=".*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--changed-since", metavar="GITREF", default=None,
        help="additionally restrict to queries whose defining module file "
        "changed since GITREF (two-speed workflow: fast local iteration; "
        "the full no-filter sweep remains the pre-driver ritual)",
    )
    ap.add_argument(
        "--workers", type=int, default=1,
        help="shard the query list over N subprocesses, each with its own "
        "Spark session — ~N× wall-clock on a 32-core host (N<=4 sensible)",
    )
    ap.add_argument(
        "--shard", metavar="I/N", default=None,
        help="(internal) run only names[I::N] of the selected list",
    )
    ap.add_argument(
        "--override", action="append", default=[], metavar="CONF=VALUE",
        help="runtime Spark conf override applied to every session "
        "(repeatable; also inherited by --workers subprocesses). The "
        "plan-invariance gate: e.g. --override "
        "spark.sql.adaptive.enabled=false --override "
        "spark.sql.shuffle.partitions=7 proves results don't depend on "
        "the physical plan",
    )
    args = ap.parse_args()

    if args.override:
        import os

        existing = os.environ.get("SHELF_SPARK_CONF_OVERRIDES", "")
        parts = ([existing] if existing else []) + args.override
        os.environ["SHELF_SPARK_CONF_OVERRIDES"] = ";".join(parts)
        print(f"# conf overrides: {os.environ['SHELF_SPARK_CONF_OVERRIDES']}")

    if args.workers > 1 and args.shard is None:
        return _run_workers(args)

    changed_mods: set[str] | None = None
    if args.changed_since:
        import subprocess

        out = subprocess.run(
            ["git", "diff", "--name-only", args.changed_since, "--", "shelf_spark"],
            capture_output=True, text=True, check=True,
        ).stdout
        changed_mods = {
            p.removesuffix(".py").replace("/", ".")
            for p in out.split()
            if p.endswith(".py")
        }
        print(f"# modules changed since {args.changed_since}: "
              f"{sorted(m.rsplit('.', 1)[-1] for m in changed_mods)}")

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(args.sf, t)}')"
        )

    pat = re.compile(args.pattern)
    names = [n for n in QUERIES if pat.search(n)]
    if changed_mods is not None:
        names = [n for n in names if QUERIES[n].__module__ in changed_mods]
    if args.shard:
        i, n = (int(x) for x in args.shard.split("/"))
        names = names[i::n]
        # Co-shard each VACUOUS-prone query with its declared twin so the
        # twin check never degrades to "not in this run" under --workers;
        # the twin may also run in its own shard (cheap, harmless).
        names += [VACUOUS_TWINS[q] for q in names
                  if q in VACUOUS_TWINS and VACUOUS_TWINS[q] not in names
                  and VACUOUS_TWINS[q] in QUERIES]
    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    vacuous: list[str] = []
    rowcounts: dict[str, int] = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            res = con.execute(ORACLES[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            n_fail += 1
            continue

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            sn, dn = _normalize(srows, scols), _normalize(drows, dcols)
            if sn != dn:
                bad = sum(1 for a, b in zip(sn, dn) if a != b)
                for a, b in zip(sn, dn):
                    if a != b:
                        problems.append(f"value diff ({bad} rows) e.g. spark={a} duckdb={b}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
            n_fail += 1
        else:
            # A 0-row/0-row match proves nothing about the expression's
            # VALUES (r12 ADVICE: embed_cosine_pairs' re-proof slot was
            # vacuous) — still a pass, but flagged so a sweep log or a
            # re-proof slot can never silently rest on one.
            vac = " (VACUOUS: 0 rows both sides)" if not srows else ""
            if not srows:
                vacuous.append(name)
            rowcounts[name] = len(srows)
            print(f"ok    {name}: {len(srows)} rows{vac} [{time.time()-t0:.1f}s]")
            n_pass += 1

    # A VACUOUS row is acceptable only when its declared value-exact twin
    # exercised the same machinery non-vacuously (r13 VERDICT ask #6);
    # anything else is UNEXPLAINED — zero of these is the gate target on
    # the standard corpora (hostile corpora may legitimately empty more
    # queries; the label still surfaces them for review).
    n_unexplained_vac = 0
    for name in vacuous:
        twin = VACUOUS_TWINS.get(name)
        if twin is None:
            n_unexplained_vac += 1
            print(f"VACUOUS-UNEXPLAINED  {name}: no declared twin")
        elif rowcounts.get(twin, 0) > 0:
            print(f"vacuous-ok  {name}: twin {twin} non-vacuous "
                  f"({rowcounts[twin]} rows)")
        elif twin in rowcounts:
            n_unexplained_vac += 1
            print(f"VACUOUS-UNEXPLAINED  {name}: twin {twin} also vacuous")
        else:
            print(f"vacuous-?  {name}: twin {twin} not in this run "
                  "(filtered) — unverified")

    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} FAIL of {len(names)}"
          + (f" ({n_unexplained_vac} unexplained-vacuous)"
             if n_unexplained_vac else ""))
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
