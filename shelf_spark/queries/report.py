"""Dataset-card reporting: the per-source summary table a curation
pipeline publishes alongside a training corpus (docs, dedup rate, token
budget, length profile) — one scan + one exact-dedup aggregation.

Reference parity: the metadata shelf tracks per dataset (reference
src/shelf/table_metadata.py sidecars) is schema-level; this is the
data-level card its users would derive with a SQL step.

Scale notes (100 TB): token/length stats aggregate map-side per source;
the dup-rate needs the (source, text-hash) distinct — the shuffle
carries 32-byte digests, never text (dedup.py's rule). Output is
sources-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .num import _round_ieee, _sql_round_ieee
from .registry import query


@query(
    "docs_dataset_card",
    oracle="""
    WITH per_doc AS (
      SELECT source, sha256(text) AS h,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ), uniq AS (
      SELECT source, count(DISTINCT h) AS n_unique FROM per_doc GROUP BY source
    )
    SELECT p.source,
           CAST(count(*) AS BIGINT)        AS n_docs,
           CAST(any_value(n_unique) AS BIGINT) AS n_unique_texts,
           {dup} AS dup_frac,
           CAST(sum(n_tok) AS BIGINT)      AS total_tokens,
           {avg} AS avg_doc_tokens,
           CAST(min(n_tok) AS BIGINT)      AS min_tokens,
           CAST(max(n_tok) AS BIGINT)      AS max_tokens
    FROM per_doc p JOIN uniq u ON p.source = u.source
    GROUP BY p.source
    ORDER BY p.source
    """.format(
        dup=_sql_round_ieee(
            "1.0 - (CAST(any_value(n_unique) AS DOUBLE) / CAST(count(*) AS DOUBLE))", 6
        ),
        avg=_sql_round_ieee("CAST(sum(n_tok) AS DOUBLE) / count(*)", 4),
    ),
)
def docs_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card: document/unique counts, exact-dup
    fraction, token budget, length extremes. The distinct-hash count
    shuffles digests only; everything else is map-side combine. All
    ratios are single IEEE divisions of exact integers."""
    d = spark.table("documents").select(
        "source",
        F.sha2("text", 256).alias("h"),
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    card = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("h").alias("n_unique_texts"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.min("n_tok").cast("long").alias("min_tokens"),
        F.max("n_tok").cast("long").alias("max_tokens"),
    )
    return card.select(
        "source",
        "n_docs",
        "n_unique_texts",
        _round_ieee(
            F.lit(1.0)
            - (F.col("n_unique_texts").cast("double") / F.col("n_docs").cast("double")),
            6,
        ).alias("dup_frac"),
        "total_tokens",
        _round_ieee(
            F.col("total_tokens").cast("double") / F.col("n_docs").cast("double"), 4
        ).alias("avg_doc_tokens"),
        "min_tokens",
        "max_tokens",
    ).orderBy("source")


@query(
    "events_rolling_active_users",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), days AS (
      SELECT DISTINCT day FROM activity
    ), dau AS (
      SELECT day, count(*) AS dau FROM activity GROUP BY day
    ), contrib AS (
      SELECT user_id, day + k.k * INTERVAL 1 DAY AS end_day
      FROM activity, (SELECT unnest(generate_series(0, 6)) AS k) k
    ), wau AS (
      SELECT CAST(end_day AS DATE) AS day, count(DISTINCT user_id) AS wau
      FROM contrib GROUP BY end_day
    )
    SELECT d.day, dau.dau, wau.wau
    FROM days d JOIN dau USING (day) JOIN wau USING (day)
    ORDER BY d.day
    """,
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + trailing-7-day WAU (exact sliding COUNT DISTINCT): each
    (user, active-day) row contributes to the 7 window-end days it falls
    in — a bounded ×7 explode — then one distinct-count per end day.
    This is how exact rolling actives scale: the explode factor is the
    window length (constant), the shuffle key is the day, and no state
    ever holds more than a window of user ids. Real days only (windows
    ending past the data are joined away)."""
    e = spark.table("events")
    activity = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    days = activity.select("day").distinct()
    dau = activity.groupBy("day").agg(F.count("*").alias("dau"))
    contrib = activity.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"), "day"
    ).select("user_id", F.date_add("day", F.col("k")).alias("day"))
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return (
        days.join(dau, "day").join(wau, "day").select("day", "dau", "wau").orderBy("day")
    )
