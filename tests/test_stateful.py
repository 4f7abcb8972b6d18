"""applyInPandasWithState running stats: accumulate across micro-batches,
survive checkpoint restarts."""

from __future__ import annotations

import glob
import shutil

import pyspark.sql.functions as F
import pytest

from cdc_spark.schema import CHANGE_SCHEMA
from cdc_spark.streaming.stateful import running_source_stats


def _expected_totals(spark, paths):
    df = spark.read.schema(CHANGE_SCHEMA).parquet(*paths)
    return {
        r["source"]: (r["n"], r["d"], r["last"])
        for r in (
            df.filter(F.col("op_type").isin("I", "U", "D"))
            .select(
                F.coalesce(F.col("after.source"), F.col("before.source"), F.lit("?")).alias("source"),
                "op_type", "lsn",
            )
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("op_type") == "D", 1).otherwise(0)).alias("d"),
                F.max("lsn").alias("last"),
            )
            .collect()
        )
    }


def _run_stream(spark, feed, ckpt):
    """Run to completion, return all emitted rows (memory sink can't
    recover from a checkpoint; foreachBatch can)."""
    out: list = []
    changes = spark.readStream.schema(CHANGE_SCHEMA).option("maxFilesPerTrigger", 1).parquet(feed)
    q = (
        running_source_stats(changes)
        .writeStream.foreachBatch(lambda bdf, _bid: out.extend(bdf.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out


@pytest.fixture()
def feed(workdir, small_binlog):
    d = f"{workdir}/stateful_feed"
    shutil.rmtree(d, ignore_errors=True)
    import os

    os.makedirs(d)
    return d


def test_running_stats_accumulate_and_resume(spark, workdir, small_binlog, feed):
    segs = sorted(glob.glob(f"{small_binlog}/segment-*.parquet"))
    ckpt = f"{workdir}/stateful_ckpt"
    shutil.rmtree(ckpt, ignore_errors=True)

    def latest_per_source(rows):
        got = {}
        for r in rows:  # emissions are cumulative; keep the max per key
            cur = got.get(r["source"])
            if cur is None or r["n_events"] > cur[0]:
                got[r["source"]] = (r["n_events"], r["n_deletes"], r["last_lsn"])
        return got

    # phase 1: first three segments
    for p in segs[:3]:
        shutil.copy(p, feed)
    rows1 = _run_stream(spark, feed, ckpt)
    assert latest_per_source(rows1) == _expected_totals(spark, segs[:3])

    # phase 2: remaining segments arrive; state resumes from checkpoint
    for p in segs[3:]:
        shutil.copy(p, feed)
    rows2 = _run_stream(spark, feed, ckpt)
    assert latest_per_source(rows2) == _expected_totals(spark, segs)
