"""Embedding compression: per-dimension int8 scalar quantization — the
store-100×-more-vectors pass an ANN system runs before indexing (the
codes feed ann_ivf_topk-style probes; see vectors.py).

Cross-engine determinism: per-dim min/max of floats are exact picks (no
accumulation); the affine code ``floor((x−mn)/(mx−mn)·255 + 0.5) − 128``
is a fixed-shape IEEE expression on identical doubles → identical codes.

Scale notes (100 TB):
- Pass 1 (per-dim min/max) explodes dim-index pairs but aggregates with
  map-side combine down to d rows — shuffle volume is O(partitions · d),
  not O(rows · d).
- Pass 2 re-reads the corpus and applies the affine map per row with the
  d-sized scale arrays crossJoin-broadcast — a narrow map stage, no
  shuffle of the corpus itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query


@query(
    "vectors_quantize_int8",
    oracle="""
    WITH dims AS (
      SELECT idx, min(x) AS mn, max(x) AS mx FROM (
        SELECT unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS idx
        FROM embeddings
      ) GROUP BY idx
    ), scales AS (
      SELECT list(mn ORDER BY idx) AS mns, list(mx ORDER BY idx) AS mxs
      FROM dims
    )
    SELECT vec_id, label,
           array_to_string(list_transform(
             list_zip(embedding, mns, mxs),
             t -> CAST(CASE WHEN CAST(t[3] AS DOUBLE) > CAST(t[2] AS DOUBLE)
                  THEN floor((CAST(t[1] AS DOUBLE) - CAST(t[2] AS DOUBLE))
                             / (CAST(t[3] AS DOUBLE) - CAST(t[2] AS DOUBLE))
                             * 255.0 + 0.5) - 128
                  ELSE 0 END AS BIGINT)
           ), ',') AS codes
    FROM embeddings CROSS JOIN scales
    ORDER BY vec_id
    """,
)
def vectors_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column: two passes —
    corpus-wide per-dimension min/max (exploded agg with map-side
    combine), then a broadcast affine map. Codes are exact-integer
    deterministic (floor(·+0.5) is pure IEEE; see num.py).

    Output contract: ``codes`` is a comma-joined string, not a raw
    array — the correctness harness canonicalizes via pandas
    ``sort_values``, which cannot factorize numpy arrays (r05 driver
    err). Integer-to-string rendering is format-identical across
    Spark and DuckDB, so value hashes still compare exactly."""
    e = spark.table("embeddings")
    dims = (
        e.select(F.posexplode("embedding").alias("idx", "x"))
        .groupBy("idx")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    scales = dims.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "mn"))), lambda s: s["mn"]
        ).alias("mns"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "mx"))), lambda s: s["mx"]
        ).alias("mxs"),
    )

    def code(x, i):
        mn = F.element_at("mns", i + 1).cast("double")
        mx = F.element_at("mxs", i + 1).cast("double")
        q = F.floor(
            (x.cast("double") - mn) / (mx - mn) * F.lit(255.0) + F.lit(0.5)
        ) - 128
        return F.when(mx > mn, q).otherwise(F.lit(0)).cast("long")

    return (
        e.crossJoin(F.broadcast(scales))
        .select(
            "vec_id",
            "label",
            F.array_join(
                F.transform(
                    "embedding", lambda x, i: code(x, i).cast("string")
                ),
                ",",
            ).alias("codes"),
        )
        .orderBy("vec_id")
    )
