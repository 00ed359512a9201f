"""Query registry: the engine's operator inventory, checkable vs DuckDB.

Every operator from SURVEY.md §2.2/§2.4 registers itself here with

- a name,
- a Spark implementation ``(spark, sf_dir) -> DataFrame``,
- optionally an equivalent ANSI-SQL oracle string DuckDB can run over the
  same Parquet tables (omitted only for genuinely non-SQL-expressible ops,
  e.g. LSH bucketing — those get a weaker rows-only check).

Contract notes (driver: /root/repo/__spark_entry__.py):
- column names must match between Spark result and oracle → alias every
  computed column on both sides;
- the driver's value-hash is order-insensitive but float-exact in spirit →
  round every double the two engines compute independently (sums, avgs)
  in *both* implementations to the same number of decimals.
"""

from __future__ import annotations

import functools
import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..data import register_views

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an operator implementation and (optionally) its SQL oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            register_views(spark, sf_dir)
            return fn(spark, sf_dir)

        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return wrapped

    return deco
