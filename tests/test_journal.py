"""Journal epoch-accounting invariants (exactly-once bookkeeping).

Round-1 ADVICE finding: the compaction watermark fold popped sparse[0]
unconditionally, so a table whose feed starts at epoch N>0 treated every
epoch < N as already-applied — a late delivery of one would silently
no-op. The fold is now bounded below by epoch_floor."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_spark.sinks.target import TargetTable


def _delta(spark, table, doc="d", lsn=1):
    sch = table.schema()
    return spark.createDataFrame(
        [("%s" % doc, [1, 2], 2, "s", lsn, False)],
        schema=sch,
    )


def test_watermark_fold_respects_nonzero_first_epoch(spark, tmp_path):
    t = TargetTable(str(tmp_path / "t"), compact_every=3)
    t.create_if_absent()
    # feed legitimately starts at epoch 10
    for e in (10, 11, 12):  # 3rd commit triggers compaction → fold
        t.commit_delta(_delta(spark, t, lsn=e), epoch=e)
    st = t.state()
    assert st["kind"] == "compact"
    assert st["epoch_floor"] == 10
    assert st["epoch_watermark"] == 12 and st["epochs"] == []
    # epochs below the floor are NOT applied: a late delivery of epoch 9
    # must be applied (or rejected by the stream driver), never no-op'd
    assert not t.has_epoch(9)
    assert all(t.has_epoch(e) for e in (10, 11, 12))
    assert t.commit_delta(_delta(spark, t, lsn=9), epoch=9) is not None
    assert t.has_epoch(9)


def test_fold_only_contiguous_prefix(spark, tmp_path):
    t = TargetTable(str(tmp_path / "t"), compact_every=3)
    t.create_if_absent()
    for e in (0, 1, 3):  # gap at 2
        t.commit_delta(_delta(spark, t, lsn=e + 1), epoch=e)
    st = t.state()
    assert st["kind"] == "compact"
    assert st["epoch_watermark"] == 1 and st["epochs"] == [3]
    assert not t.has_epoch(2) and t.has_epoch(3)


def test_resolved_rows_survive_compaction(spark, tmp_path):
    t = TargetTable(str(tmp_path / "t"), compact_every=2)
    t.create_if_absent()
    t.commit_delta(_delta(spark, t, doc="a", lsn=1), epoch=5)
    t.commit_delta(_delta(spark, t, doc="b", lsn=2), epoch=6)
    rows = {r["doc_id"] for r in t.read_resolved(spark).collect()}
    assert rows == {"a", "b"}
    assert t.state()["epoch_floor"] == 5


def test_orphan_delta_dir_from_crash_is_ignored_then_overwritten(spark, tmp_path):
    """Crash window: delta files written but journal never committed
    (e.g. the fast path's guard raised after the write). The orphan dir
    must not be read (only journaled delta_epochs resolve) and a later
    apply of the same epoch must overwrite it cleanly."""
    import os

    t = TargetTable(str(tmp_path / "t"), compact_every=100)
    t.create_if_absent()
    t.commit_delta(_delta(spark, t, doc="a", lsn=1), epoch=0)
    # simulate the crash leftovers: garbage rows in an unjournaled epoch dir
    orphan = str(tmp_path / "t" / "delta" / "epoch=00000007")
    _delta(spark, t, doc="GARBAGE", lsn=999).write.mode("overwrite").parquet(orphan)
    assert os.path.isdir(orphan)
    rows = {r["doc_id"] for r in t.read_resolved(spark).collect()}
    assert rows == {"a"}  # orphan not visible
    t.commit_delta(_delta(spark, t, doc="b", lsn=2), epoch=7)
    rows = {r["doc_id"] for r in t.read_resolved(spark).collect()}
    assert rows == {"a", "b"}  # garbage overwritten, not unioned
