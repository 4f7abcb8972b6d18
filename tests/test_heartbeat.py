"""T10 heartbeat tolerance + K7 unknown-op strictness (reference:
heartbeats dropped Normalizer.java:68-72; unknown ops fail the batch
like the Kudu sink CDCKudu.java:171-173)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from cdc_spark.genlog import GenConfig, write_binlog
from cdc_spark.streaming.pipeline import apply_batch, read_changes, replay
from cdc_spark.sinks.target import TargetTable
from tests.conftest import assert_matches_oracle

HB_CFG = GenConfig(n_events=4000, n_docs=300, events_per_epoch=1000, p_heartbeat=0.05, seed=42)


@pytest.fixture(scope="module")
def hb_binlog(workdir):
    d = f"{workdir}/binlog_hb"
    write_binlog(HB_CFG, d)
    return d


def test_feed_contains_heartbeats(hb_binlog):
    ops = set()
    for p in glob.glob(f"{hb_binlog}/segment-*.parquet"):
        ops |= set(pq.read_table(p, columns=["op_type"])["op_type"].to_pylist())
    assert "H" in ops


def test_heartbeats_dropped_final_state_matches_oracle(spark, workdir, hb_binlog):
    table = replay(spark, hb_binlog, f"{workdir}/table_hb", lineage=True)
    assert_matches_oracle(spark, table, hb_binlog)
    # heartbeat counts surface in lineage, not in the table
    import json

    lineage_files = glob.glob(f"{workdir}/table_hb/_lineage/*.json")
    n_hb = sum(
        row["n_heartbeat"] for f in lineage_files for row in json.load(open(f))
    )
    assert n_hb > 0


def test_unknown_op_fails_batch(spark, workdir, small_binlog):
    seg = sorted(glob.glob(f"{small_binlog}/segment-*.parquet"))[0]
    bad = read_changes(spark, seg).withColumn(
        "op_type",
        __import__("pyspark.sql.functions", fromlist=["x"]).lit("X"),
    )
    table = TargetTable(f"{workdir}/table_badop")
    table.create_if_absent()
    with pytest.raises(ValueError, match="unknown op_type"):
        apply_batch(spark, table, bad, epoch=0)
