"""Structured Streaming operators surfaced through the driver contract.

Each entry runs a real ``readStream`` plan over the events parquet with an
availableNow trigger (process everything, then stop) and returns the
result as a batch DataFrame. In a single pass watermarks drop nothing, so
``stream_tumbling_window`` is exactly the batch tumbling query — it gets
the same DuckDB oracle (full value-hash check, not rows-only).

The stateful ops (`applyInPandasWithState` running totals) are
rows-only-checked: their update-mode output shape has no SQL equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .events import SQL_DSUM_VALUE, _BUCKET_10M
from .registry import query


def _events_path(sf_dir: str) -> str:
    import os

    return os.path.join(sf_dir, "events.parquet")


@query(
    "stream_tumbling_window",
    oracle=f"""
    SELECT {_BUCKET_10M} AS w_start,
           event_type,
           count(*) AS n_events,
           {SQL_DSUM_VALUE} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import streaming as S

    stream = S.events_stream(spark, _events_path(sf_dir))
    return S.run_available_now(
        S.tumbling_counts(stream), "q_stream_tumbling", output_mode="complete"
    )


@query("stream_user_running_totals")  # rows-only: stateful update-mode output
def stream_user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import streaming as S

    stream = S.events_stream(spark, _events_path(sf_dir))
    return S.run_available_now(
        S.user_running_totals(stream), "q_stream_user_totals", output_mode="update"
    )
