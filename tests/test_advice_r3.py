"""Round-3 ADVICE regression pins: framed-Avro misrouting and the
multi-table verifier mutating its verification target."""

from __future__ import annotations

import json
import os

import pytest


def test_framed_values_refuse_jvm_path(spark, small_binlog):
    """Single-object-framed values through from_avro would decode the
    C3 01 marker bytes as data (garbage rows, not an error) — the
    explicit jvm path must detect the framing and fail loudly."""
    import glob

    from cdc_spark.sources.avro import decode_avro_changes, encode_avro_changes
    from cdc_spark.sources.binlog import read_changes


    seg = sorted(glob.glob(f"{small_binlog}/segment-*.parquet"))[0]
    changes = read_changes(spark, seg)
    n = changes.count()
    wire = encode_avro_changes(changes).localCheckpoint(eager=True)
    with pytest.raises(ValueError, match="single-object C3 01 framing"):
        decode_avro_changes(wire, impl="jvm")
    # auto on the same framed batch routes to the python kernel
    assert decode_avro_changes(wire, impl="auto").count() == n


def test_verify_multi_table_does_not_create_missing_table(spark, workdir):
    """verify --multi-table on a root missing one routed table must
    report the miss as diffs, NOT create a journal inside the target."""
    from cdc_spark.genlog import GenConfig, write_binlog
    from cdc_spark.sinks.target import TableRouter
    from cdc_spark.streaming.pipeline import replay_multi

    d = f"{workdir}/binlog_vmt"
    write_binlog(
        GenConfig(n_events=2000, n_docs=100, events_per_epoch=1000, seed=7,
                  tables=("a.t", "b.t")),
        d,
    )
    root = f"{workdir}/vmt_root"
    replay_multi(spark, d, root, lineage=False)
    # simulate a table the engine never routed
    router = TableRouter(root)
    missing_path = router.path_of("b.t")
    import shutil
    import subprocess
    import sys

    shutil.rmtree(missing_path)
    # subprocess: job.main stops its session on exit, which must not
    # kill this test session's shared SparkSession
    proc = subprocess.run(
        [sys.executable, "-m", "cdc_spark.job", "verify", "--binlog", d,
         "--table", root, "--multi-table", "--master", "local[2]"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 1, proc.stdout + proc.stderr  # diffs reported
    assert not os.path.isdir(missing_path), "verifier must not create the table"


def test_windowed_ltz_start_is_instant(spark):
    """window_start_s must be the epoch instant for TIMESTAMP (LTZ)
    input regardless of the session timezone."""
    from pyspark.sql import functions as F

    from cdc_spark.streaming.windowed import windowed_event_stats

    df = spark.createDataFrame(
        [("2024-03-01 10:15:00",), ("2024-03-01 10:45:00",)], "s string"
    ).select(F.to_timestamp("s").alias("ts"), F.lit("x").alias("event_type"))
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = windowed_event_stats(df, value_col=None).first()["window_start_s"]
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        tokyo = windowed_event_stats(df, value_col=None).first()["window_start_s"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert utc == tokyo
