"""Head-to-head: the Spark engine vs single-node DuckDB on the SAME
queries at the same scale factor.

The reference delegates every query to in-process DuckDB, so "match or
beat the reference's single-node throughput" concretely means: run each
registered oracle SQL on DuckDB over the sf0.1 parquet and compare its
wall time against the Spark implementation's bench median
(BENCH_local.json — measured on the same machine, same data).

Fairness rules:

- Only queries whose oracle is a REASONABLE DuckDB formulation compete.
  Several oracles are deliberately naive so they can verify a smarter
  Spark plan (transitive-closure CTEs for star-contraction components,
  the O(df²) shingle self-join behind the prefix-filtered Jaccard join,
  unrolled per-iteration CTEs for PageRank/Markov/K-M). Timing those
  would flatter Spark for the wrong reason — they are EXCLUDED, listed
  with the reason, and count for neither side.
- DuckDB gets the same warm-then-median-of-3 protocol, all cores
  (its default), and materializes results with fetchall() (the analogue
  of the bench's noop write: full execution, driver-side payload).
- Streaming operators have no DuckDB analogue and are skipped.

Usage: python tools/bench_vs_duckdb.py [--sf DIR]  (prints one JSON line)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from shelf_spark.data import TABLES, table_path  # noqa: E402
from shelf_spark.queries import ORACLES  # noqa: E402

#: Oracles that are deliberately naive twins of a smarter Spark plan —
#: timing them would compare Spark's algorithm against a strawman.
EXCLUDED = {
    "dedup_ngram_jaccard": "oracle is the O(df²) naive shingle self-join",
    "dedup_near_dup_clusters": "oracle is a transitive-closure recursive CTE",
    "dedup_semantic_clusters": "oracle is a transitive-closure recursive CTE",
    "dedup_semantic_clusters_t40": "oracle is a transitive-closure recursive CTE",
    "graph_connected_components": "oracle is a transitive-closure recursive CTE",
    "dedup_minhash_lsh_selfdup": "oracle is the naive all-pairs set-equality join",
    "graph_pagerank": "oracle is iteration-unrolled chained CTEs",
    "events_markov_stationary": "oracle is iteration-unrolled chained CTEs",
    "vectors_pca_top_component": "oracle is iteration-unrolled chained CTEs",
    "vectors_abtt_postprocess": "oracle is iteration-unrolled chained CTEs",
    "graph_triangle_count": "oracle re-derives orientation per wedge",
    "dedup_substring_exact": "oracle re-hashes every window naively",
    "multimodal_audio_features": "oracle frames PCM as rows (the layout the Spark op avoids)",
    "multimodal_audio_vad_segments": "oracle frames PCM as rows",
    "multimodal_video_scene_cuts": "oracle frames video as rows",
    "ann_lsh_topk": "oracle evaluates the banded signature per pair",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--bench-json",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_local.json",
        ),
    )
    args = ap.parse_args()

    spark_bench = json.load(open(args.bench_json))
    spark_q = spark_bench["queries"]
    # The comparison is only meaningful same-scale: refuse to mix a
    # BENCH_local.json recorded at one sf with DuckDB runs at another.
    import re

    m = re.search(r"sf([0-9.]+)", args.sf)
    duck_sf = float(m.group(1)) if m else None
    if duck_sf is not None and spark_bench.get("sf") not in (None, duck_sf):
        sys.exit(
            f"sf mismatch: {args.bench_json} was recorded at "
            f"sf={spark_bench.get('sf')} but --sf points at sf={duck_sf}"
        )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(args.sf, t)}')"
        )

    names = [
        n for n in spark_q
        if n in ORACLES and n not in EXCLUDED and not n.startswith("stream_")
    ]
    duck: dict[str, float] = {}
    for name in names:
        sql = ORACLES[name]
        try:
            con.execute(sql).fetchall()  # warm
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                runs.append(time.perf_counter() - t0)
            duck[name] = round(statistics.median(runs), 3)
        except Exception as exc:  # noqa: BLE001
            print(f"# duckdb error on {name}: {exc}", file=sys.stderr)

    shared = sorted(set(duck) & set(spark_q))
    s_tot = round(sum(spark_q[n] for n in shared), 3)
    d_tot = round(sum(duck[n] for n in shared), 3)
    ratios = {n: round(spark_q[n] / max(duck[n], 1e-9), 1) for n in shared}
    spark_wins = [n for n in shared if spark_q[n] <= duck[n]]
    print(
        json.dumps(
            {
                "metric": "spark_vs_duckdb_same_queries",
                "sf": spark_bench.get("sf"),
                "n_compared": len(shared),
                "spark_total_sec": s_tot,
                "duckdb_total_sec": d_tot,
                "spark_over_duckdb": round(s_tot / d_tot, 2) if d_tot else None,
                "spark_wins": len(spark_wins),
                "excluded": len(EXCLUDED),
                "per_query": {
                    n: {"spark": spark_q[n], "duckdb": duck[n], "ratio": ratios[n]}
                    for n in shared
                },
            }
        )
    )


if __name__ == "__main__":
    main()
