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
