"""Journal time travel (Iceberg `VERSION AS OF` analogue): a past
version's exact table state — rows AND schema — reproduces from the
retained journal entry, and expired history fails loudly instead of
answering wrong."""

from __future__ import annotations

import pytest

from cdc_spark.sinks.target import TargetTable
from cdc_spark.streaming.pipeline import replay


def _rows(df):
    def _h(v):
        return tuple(v) if isinstance(v, list) else v

    return {
        tuple(sorted((k, _h(v)) for k, v in r.asDict().items()))
        for r in df.collect()
    }


def test_read_resolved_at_past_versions(spark, workdir, small_binlog):
    """Replay epoch by epoch, snapshotting (version, rows, columns)
    after each; after the full replay every recorded version must
    reproduce its snapshot exactly — including the pre-DDL schema."""
    d = f"{workdir}/tt_table"
    snaps = []
    for k in range(1, 6):
        table = replay(spark, small_binlog, d, stop_after=k, lineage=False)
        cur = table.read_resolved(spark)
        snaps.append((table.state()["version"], _rows(cur), set(cur.columns)))

    table = TargetTable(d)
    assert len({v for v, _, _ in snaps}) == len(snaps)
    for version, rows, cols in snaps:
        got = table.read_resolved(spark, version=version)
        assert set(got.columns) == cols
        assert _rows(got) == rows
    # the DDL schedule adds/renames columns mid-feed (quality ->
    # quality_score), so time travel must change the visible schema,
    # not just the rows
    assert snaps[0][2] != snaps[-1][2]


def test_unknown_version_raises(spark, workdir, small_binlog):
    d = f"{workdir}/tt_unknown"
    table = replay(spark, small_binlog, d, stop_after=1, lineage=False)
    with pytest.raises(ValueError, match="not in journal"):
        table.read_resolved(spark, version=99_999)
    with pytest.raises(ValueError, match="not both"):
        table.read_resolved(spark, state=table.state(), version=1)


def test_compaction_expires_history_loudly(spark, workdir, small_binlog):
    """After compaction garbage-collects a version's delta/base dirs the
    time-travel read must raise (journal references missing dirs), not
    silently resolve against the rewritten base."""
    d = f"{workdir}/tt_expired"
    table = replay(spark, small_binlog, d, stop_after=3, lineage=False)
    v_old = table.state()["version"]
    replay(spark, small_binlog, d, lineage=False)  # resume epochs 4-5
    table.compact(spark)
    latest = table.read_resolved(spark)
    assert latest.count() > 0  # current read unaffected
    with pytest.raises(FileNotFoundError, match="journal references"):
        table.read_resolved(spark, version=v_old).collect()
