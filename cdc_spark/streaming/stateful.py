"""Custom stateful streaming operator: per-key running ingest stats.

The reference's only stateful operators are schema-dedup `mapWithState`
funnelled through ONE key (CTSQLServer.java:76-87, T1/T2) — state that
cannot scale past a single partition. This is the Spark-idiomatic
counterpart: `applyInPandasWithState` keyed by an arbitrary column, so
state shards across executors and each Arrow batch updates its group's
state without per-row Python round-trips.

Used for per-source ingest accounting (events seen, last lsn, net live
rows) that must survive across micro-batches — the streaming analogue
of the per-epoch lineage rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

STATS_SCHEMA = StructType([
    StructField("source", StringType(), False),
    StructField("n_events", LongType(), False),
    StructField("n_deletes", LongType(), False),
    StructField("last_lsn", LongType(), False),
])

_STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("n_deletes", LongType()),
    StructField("last_lsn", LongType()),
])


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_events, n_deletes, last_lsn = (
        state.get if state.exists else (0, 0, -1)
    )
    for pdf in pdfs:
        n_events += len(pdf)
        n_deletes += int((pdf["op_type"] == "D").sum())
        if len(pdf):
            last_lsn = max(last_lsn, int(pdf["lsn"].max()))
    state.update((int(n_events), int(n_deletes), int(last_lsn)))
    yield pd.DataFrame(
        [{"source": key[0], "n_events": n_events, "n_deletes": n_deletes,
          "last_lsn": last_lsn}]
    )


def running_source_stats(changes: DataFrame) -> DataFrame:
    """Running per-source totals over a *streaming* change feed.

    Emits one row per (source, micro-batch) with totals accumulated
    since stream start; state lives in the checkpoint, so restart
    resumes the counts exactly."""
    keyed = changes.filter(F.col("op_type").isin("I", "U", "D")).select(
        F.coalesce(F.col("after.source"), F.col("before.source"), F.lit("?")).alias("source"),
        "op_type", "lsn",
    )
    return keyed.groupBy("source").applyInPandasWithState(
        _update,
        outputStructType=STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
