"""Multi-part binlog segments: scan parallelism without losing the
epoch-atomic exactly-once contract."""

from __future__ import annotations

import glob
import shutil

import pytest

from cdc_spark.genlog import GenConfig, write_binlog
from cdc_spark.streaming.pipeline import replay, stream
from tests.conftest import assert_matches_oracle

CFG = GenConfig(n_events=4000, n_docs=300, events_per_epoch=1000, seed=42)


@pytest.fixture(scope="module")
def parts_binlog(workdir):
    d = f"{workdir}/binlog_parts"
    paths = write_binlog(CFG, d, parts=4)
    assert len(paths) == CFG.n_epochs * 4
    return d


def test_multipart_equals_singlefile_binlog(workdir, parts_binlog):
    single = f"{workdir}/binlog_single_mp"
    write_binlog(CFG, single)
    import pyarrow.parquet as pq

    one = pq.read_table(sorted(glob.glob(f"{single}/segment-*.parquet"))[0])
    many = [pq.read_table(p) for p in sorted(glob.glob(f"{parts_binlog}/segment-00000-*.parquet"))]
    import pyarrow as pa

    assert pa.concat_tables(many).equals(one)


def test_replay_multipart_matches_oracle(spark, workdir, parts_binlog):
    table = replay(spark, parts_binlog, f"{workdir}/table_mp", lineage=False)
    assert_matches_oracle(spark, table, parts_binlog)


def test_split_epoch_delivery_fails_loudly(spark, workdir, parts_binlog):
    """An epoch split across micro-batches must raise, not silently drop
    the late half (journal records per-epoch count+lsn range)."""
    feed = f"{workdir}/feed_split"
    import os

    os.makedirs(feed, exist_ok=True)
    # deliver only half of epoch 0's parts first
    for p in sorted(glob.glob(f"{parts_binlog}/segment-00000-p*.parquet"))[:2]:
        shutil.copy(p, feed)
    stream(spark, feed, f"{workdir}/table_split", f"{workdir}/ckpt_split")
    # now the remaining parts of epoch 0 arrive in a later micro-batch
    for p in sorted(glob.glob(f"{parts_binlog}/segment-00000-p*.parquet"))[2:]:
        shutil.copy(p, feed)
    with pytest.raises(Exception, match="redelivered with different contents"):
        stream(spark, feed, f"{workdir}/table_split", f"{workdir}/ckpt_split")


def test_true_redelivery_still_noop(spark, workdir, parts_binlog):
    """Re-running replay over the same multi-part binlog is a no-op."""
    t1 = replay(spark, parts_binlog, f"{workdir}/table_mp2", lineage=False)
    v1 = t1.state()["version"]
    t2 = replay(spark, parts_binlog, f"{workdir}/table_mp2", lineage=False)
    assert t2.state()["version"] == v1
