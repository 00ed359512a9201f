"""The UDF tier (SURVEY.md §2.2 "UDF surface" / "UDAF-UDTF" rows).

The reference's "UDF" is a whole Python step over files (reference
``src/shelf/tables.py:142-152`` — re-provided verbatim by
``framework/tables.py``). This module covers the finer-grained tiers the
brief asks for, each with a DuckDB oracle so the slow-path code is held
to the same exactness bar as the built-ins:

- **scalar Pandas UDF** (`@pandas_udf`): Arrow-batched, vectorized —
  the only acceptable form of per-row Python at scale (10-100× over
  row-at-a-time `F.udf`).
- **grouped applyInPandas** (UDAF-equivalent): arbitrary per-group pandas
  logic; one shuffle on the group key, Arrow both ways.

Rule of thumb enforced everywhere else in this repo: built-in JVM
expressions first; these exist for semantics Spark genuinely lacks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .num import sane_ts, sql_sane_ts
from .registry import query


@query(
    "udf_pandas_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             avg(value) AS m,
             stddev_samp(value) AS s
      FROM events GROUP BY event_type
    )
    SELECT e.event_id,
           round(CASE WHEN (e.value - st.m)/st.s >  3.0 THEN  3.0
                      WHEN (e.value - st.m)/st.s < -3.0 THEN -3.0
                      ELSE (e.value - st.m)/st.s END, 6) AS z
    FROM events e JOIN stats st USING (event_type)
    """,
)
def udf_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-type standardization: JVM-side agg for the stats (broadcast back),
    # Arrow-batched pandas UDF for the normalization arithmetic. (Defined
    # here, not at module scope: @pandas_udf parses its DDL return type
    # eagerly and needs an active session.)
    @pandas_udf("double")
    def _zscore_clip(v: pd.Series, mean: pd.Series, std: pd.Series) -> pd.Series:
        z = (v - mean) / std
        return z.clip(-3.0, 3.0).round(6)

    e = spark.table("events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("s")
    )
    return (
        e.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            _zscore_clip(F.col("value"), F.col("m"), F.col("s")).alias("z"),
        )
    )


@query(
    "udf_grouped_regression",
    oracle=f"""
    WITH pts AS (
      -- sanity window (r10 time corpus): rows cross the Arrow/pandas
      -- bridge, whose ns timestamps die at year 2262. Interpolated from
      -- num.sql_sane_ts so a TS_SANE_* change can't desynchronize this
      -- oracle from the Spark-side sane_ts filter (r10 ADVICE).
      SELECT user_id, epoch_us(ts) / 1000000.0 AS x, value AS y FROM events
      WHERE {sql_sane_ts('ts')}
    ),
    g AS (
      SELECT user_id, avg(x) AS mx, avg(y) AS my, count(*) AS n
      FROM pts GROUP BY user_id HAVING count(*) >= 2
    )
    SELECT p.user_id,
           round(sum((p.x - g.mx) * (p.y - g.my)) / sum((p.x - g.mx) * (p.x - g.mx)), 6) AS slope,
           round(any_value(g.my) - sum((p.x - g.mx) * (p.y - g.my)) / sum((p.x - g.mx) * (p.x - g.mx)) * any_value(g.mx), 6) AS intercept,
           any_value(g.n) AS n
    FROM pts p JOIN g USING (user_id)
    GROUP BY p.user_id
    """,
)
def udf_grouped_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of event value over time via ``applyInPandas`` —
    the UDAF-equivalent tier: arbitrary pandas logic per group, one
    shuffle on the key. (Expressible with covar/var built-ins too; done
    as a UDF deliberately to pin the Arrow round-trip to an oracle.)

    Cross-engine exactness: the oracle uses the *same* two-pass formula —
    streaming covariance aggregates (regr_slope) disagree with two-pass
    OLS at ~1e-6 on ill-conditioned epoch-scale x, which no output
    rounding can absorb. x = integer epoch-microseconds / 1e6 on both
    sides, so even the IEEE division rounding is identical.
    """

    def ols(pdf: pd.DataFrame) -> pd.DataFrame:
        # ts is us-precision; int64 ns // 1000 = exact integer us
        x = (pdf["ts"].astype("int64") // 1000) / 1_000_000.0
        y = pdf["value"]
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(columns=["user_id", "slope", "intercept", "n"])
        mx, my = x.mean(), y.mean()
        sxx = ((x - mx) ** 2).sum()
        sxy = ((x - mx) * (y - my)).sum()
        slope = sxy / sxx
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "slope": [round(slope, 6)],
                "intercept": [round(my - slope * mx, 6)],
                "n": [n],
            }
        )

    # Sanity window (num.TS_SANE_*): the Arrow/pandas bridge's ns-epoch
    # timestamps overflow at year 2262 — a 9999 sentinel would kill the
    # whole job before ols() even runs (r10 time corpus).
    #
    # r14: project to the three columns ols() reads BEFORE the grouped
    # exchange (guide §4.1 — Spark cannot see inside the pandas function,
    # so unprojected it ships event_id/event_type/props through the
    # shuffle and the Arrow bridge), and pin the exchange width at
    # defaultParallelism: the projected shuffle is small enough that AQE
    # coalesces it to ~1 partition, serializing every per-group Python
    # call on one core (measured 2.1 s full-width vs 4.0 s projected-
    # but-coalesced vs 0.65 s projected+pinned at sf0.1). The width is
    # derived from the session's core count, never a constant.
    e = (
        spark.table("events")
        .filter(sane_ts(F.col("ts")))
        .select("user_id", "ts", "value")
        .repartition(spark.sparkContext.defaultParallelism, "user_id")
    )
    return e.groupBy("user_id").applyInPandas(
        ols, "user_id bigint, slope double, intercept double, n bigint"
    )


@query(
    "udtf_ngrams",
    oracle="""
    WITH cleaned AS (
      SELECT doc_id,
             list_filter(
               string_split(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), ' '),
               w -> w <> '') AS ws
      FROM documents
    ),
    idx AS (
      SELECT doc_id, ws, UNNEST(range(1, len(ws))) AS i FROM cleaned
    )
    SELECT doc_id, CAST(i AS INT) AS pos, ws[i] || ' ' || ws[i+1] AS bigram
    FROM idx
    """,
)
def udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram expansion via a Python UDTF (Spark's table-function
    tier: one input row → many output rows with arbitrary Python).

    Scale: UDTFs execute per-partition like mapInPandas — no shuffle; the
    row expansion (~|words| per doc) is the same cost explode() would pay.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, bigram string")
    class Bigrams:
        def eval(self, text: str):
            import re

            words = [w for w in re.sub(r"[^a-zA-Z0-9 ]", " ", text).lower().split(" ") if w]
            for i in range(len(words) - 1):
                yield i + 1, f"{words[i]} {words[i + 1]}"

    spark.udtf.register("bigrams_udtf", Bigrams)
    spark.table("documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.bigram
        FROM documents d, LATERAL bigrams_udtf(d.text) b
        """
    )


@query(
    "udf_arrow_scalar",
    oracle="""
    SELECT doc_id,
           CASE
             WHEN n_chars < 200 THEN 'short'
             WHEN n_chars < 400 THEN 'medium'
             ELSE 'long'
           END AS size_class,
           CAST(n_chars // 100 AS BIGINT) AS centile_bucket
    FROM documents
    """,
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (`F.udf(useArrow=True)`) — the
    tier between row-at-a-time pickled UDFs (never acceptable) and
    `@pandas_udf` (preferred): same per-row Python signature, but batch
    transfer over Arrow. Exists to pin the API surface and its exactness;
    the logic is deliberately expressible as a CASE so the oracle checks
    the round-trip bit-for-bit. Real use: per-row logic needing Python
    objects (regex libs, tokenizers) where a vectorized form is awkward.
    """
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    @F.udf(
        returnType=StructType(
            [
                StructField("size_class", StringType()),
                StructField("centile_bucket", LongType()),
            ]
        ),
        useArrow=True,
    )
    def classify(n_chars: int):
        if n_chars < 200:
            cls = "short"
        elif n_chars < 400:
            cls = "medium"
        else:
            cls = "long"
        return (cls, n_chars // 100)

    d = spark.table("documents")
    out = d.select("doc_id", classify(F.col("n_chars")).alias("c"))
    return out.select(
        "doc_id", F.col("c.size_class").alias("size_class"),
        F.col("c.centile_bucket").alias("centile_bucket"),
    )
