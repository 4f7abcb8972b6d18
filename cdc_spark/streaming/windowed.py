"""Event-time windowed aggregation with late-data watermarking.

The reference has no event-time semantics (its DStream batches are
processing-time only); this module supplies the Structured-Streaming
window operator a monitoring/rollup consumer of the change feed needs:

- :func:`windowed_event_stats` — the aggregation expression itself
  (tumbling event-time windows keyed by a dimension column). Pure
  DataFrame ops, so the SAME function serves batch (SQL-oracle-able,
  contract query `cdc_windowed_agg`) and streaming input.
- :func:`stream_windowed_stats` — the streaming wrapper:
  ``withWatermark`` bounds state and drops too-late rows; append output
  mode emits each window exactly once, when the watermark passes its
  end (pinned by tests/test_windowed.py with a deliberately late event).

Window starts are returned as epoch SECONDS (long): a timestamp column
collected via Py4J renders in the driver session's timezone while
DuckDB returns naive UTC — casting to long compares instants, not
renderings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling event-time windows × key → count (+ rounded value sum).

    Works unchanged on batch and streaming inputs, and the emitted
    window_start_s is session-timezone-independent for BOTH timestamp
    flavors: TIMESTAMP (LTZ) stores an instant, so unix_micros reads it
    directly; TIMESTAMP_NTZ is a naive value interpreted as UTC via
    field arithmetic (a direct cast is illegal for NTZ and
    unix_timestamp() would re-interpret it in the session timezone)."""
    w = F.window(ts_col, window)
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 3).alias("sum_value"))
    if df.schema[ts_col].dataType.typeName() == "timestamp_ntz":
        start_s = (
            F.unix_date(F.to_date("w.start")) * F.lit(86400)
            + F.hour("w.start") * F.lit(3600)
            + F.minute("w.start") * F.lit(60)
            + F.second("w.start")
        ).cast("long")
    else:
        start_s = (F.unix_micros(F.col("w.start")) / F.lit(1_000_000)).cast("long")
    return (
        df.groupBy(w.alias("w"), F.col(key_col))
        .agg(*aggs)
        .select(
            start_s.alias("window_start_s"),
            F.col(key_col),
            *[F.col(c) for c in (["n_events"] + (["sum_value"] if value_col else []))],
        )
    )


def stream_windowed_stats(
    changes: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    value_col: str | None = "value",
    late_threshold: str = "30 minutes",
) -> DataFrame:
    """Streaming form: watermark bounds the window state (windows older
    than max(event time) − late_threshold finalize and their state is
    dropped; later-arriving rows for them are discarded — the documented
    late-data contract). Write with outputMode('append').

    Watermarks require TIMESTAMP (with local timezone); a TIMESTAMP_NTZ
    event-time column is cast, which interprets the naive value in the
    session timezone — run with spark.sql.session.timeZone=UTC (the
    engine session default) for instant-preserving semantics."""
    from pyspark.sql import types as T

    if isinstance(changes.schema[ts_col].dataType, T.TimestampNTZType):
        changes = changes.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return windowed_event_stats(
        changes.withWatermark(ts_col, late_threshold),
        ts_col=ts_col, key_col=key_col, window=window, value_col=value_col,
    )
