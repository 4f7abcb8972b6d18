"""JDBC polling source (S1 transport) against the Derby embedded DB
bundled with Spark: binlog rows loaded into a real `changes` outbox
table, polled back per epoch through partitioned JDBC scans, applied
via the shared apply_batch — final state golden-checked vs the oracle."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from cdc_spark.sources.binlog import read_changes
from cdc_spark.sources.jdbc import (
    DERBY_DRIVER,
    jdbc_replay,
    outbox_epochs,
    read_outbox_range,
)

from conftest import rows_equal


@pytest.fixture(scope="module")
def derby_outbox(spark, workdir, small_binlog):
    """Load the first 3 binlog epochs into a Derby `changes` table via
    plain JDBC (py4j DriverManager — driver-side, test harness only)."""
    url = f"jdbc:derby:{workdir}/derby_db;create=true"
    segs = sorted(glob.glob(f"{small_binlog}/segment-*.parquet"))[:3]
    rows = (
        read_changes(spark, segs)
        .select("lsn", "epoch", F.to_json(F.struct("*")).alias("payload"))
        .collect()
    )
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE changes (lsn BIGINT PRIMARY KEY, epoch INT NOT NULL, "
        "payload VARCHAR(32000))"
    )
    ps = conn.prepareStatement("INSERT INTO changes VALUES (?, ?, ?)")
    for r in rows:
        ps.setLong(1, r["lsn"])
        ps.setInt(2, r["epoch"])
        ps.setString(3, r["payload"])
        ps.addBatch()
    ps.executeBatch()
    conn.commit()
    conn.close()
    return url, segs, len(rows)


def test_outbox_epoch_watermarks(spark, derby_outbox):
    url, segs, n_rows = derby_outbox
    eps = outbox_epochs(spark, url, driver=DERBY_DRIVER)
    assert [e["epoch"] for e in eps] == [0, 1, 2]
    assert sum(e["n"] for e in eps) == n_rows
    for e in eps:
        assert e["lo"] <= e["hi"]


def test_partitioned_range_scan_roundtrips(spark, derby_outbox, small_binlog):
    url, segs, _ = derby_outbox
    eps = outbox_epochs(spark, url, driver=DERBY_DRIVER)
    e0 = eps[0]
    got = read_outbox_range(
        spark, url, e0["lo"], e0["hi"], num_partitions=4, driver=DERBY_DRIVER
    )
    want = read_changes(spark, segs[0])
    assert got.count() == want.count()
    g = {r["lsn"]: r.asDict(recursive=True) for r in got.collect()}
    w = {r["lsn"]: r.asDict(recursive=True) for r in want.collect()}
    assert g == w
    # the scan really is partitioned: 4 JDBC partitions
    assert got.rdd.getNumPartitions() == 4


def test_jdbc_replay_matches_oracle_and_is_idempotent(
    spark, workdir, derby_outbox, small_binlog
):
    from cdc_spark import oracle

    url, segs, _ = derby_outbox
    t = jdbc_replay(spark, url, f"{workdir}/t_jdbc", driver=DERBY_DRIVER)
    state, reg = oracle.replay(segs)
    expected = oracle.final_rows(state, reg)
    actual = [r.asDict() for r in t.read_resolved(spark).collect()]
    diffs = rows_equal(expected, actual)
    assert not diffs, f"{len(diffs)} diffs, first 5: {diffs[:5]}"
    v = t.state()["version"]
    # re-poll: every epoch already applied → journal untouched
    t2 = jdbc_replay(spark, url, f"{workdir}/t_jdbc", driver=DERBY_DRIVER)
    assert t2.state()["version"] == v
