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


def test_changelog_applies_forward_to_latest_state(spark, workdir):
    """read_changes_between(v_a) must be a COMPLETE changelog: applying
    its upserts/deletes (LWW by last_lsn) on top of the v_a snapshot
    reproduces the latest resolved state exactly. DDL-free feed so both
    snapshots share one schema."""
    from cdc_spark.genlog import GenConfig, write_binlog

    d = f"{workdir}/cl_binlog"
    t = f"{workdir}/cl_table"
    write_binlog(
        GenConfig(n_events=4000, n_docs=300, events_per_epoch=1000,
                  seed=11, ddl_schedule=()),
        d,
    )
    table = replay(spark, d, t, stop_after=2, lineage=False)
    v_a = table.state()["version"]
    snap_a = {r["doc_id"]: r.asDict() for r in table.read_resolved(spark).collect()}
    replay(spark, d, t, lineage=False)  # epochs 3-4
    latest = {r["doc_id"]: r.asDict() for r in table.read_resolved(spark).collect()}

    ch = table.read_changes_between(spark, v_a)
    rows = sorted(
        (r.asDict() for r in ch.collect()), key=lambda r: r["last_lsn"]
    )
    assert rows, "changelog between v_a and latest must be non-empty"
    assert {r["_change_type"] for r in rows} <= {"upsert", "delete"}
    state = dict(snap_a)
    for r in rows:
        if r["_change_type"] == "delete":
            state.pop(r["doc_id"], None)
        else:
            state[r["doc_id"]] = {
                k: v for k, v in r.items() if k not in ("_change_type", "_epoch")
            }

    def _cmp(d_):
        return {
            k: {kk: (tuple(vv) if isinstance(vv, list) else vv)
                for kk, vv in v.items()}
            for k, v in d_.items()
        }

    assert _cmp(state) == _cmp(latest)


def test_changelog_empty_and_expired(spark, workdir, small_binlog):
    d = f"{workdir}/cl_table2"
    table = replay(spark, small_binlog, d, lineage=False)
    v = table.state()["version"]
    empty = table.read_changes_between(spark, v)
    assert empty.count() == 0
    assert {"_change_type", "_epoch", "doc_id", "last_lsn"} <= set(empty.columns)
    hist = table.history()
    assert [h["version"] for h in hist] == sorted(h["version"] for h in hist)
    assert any(h["kind"] == "delta" for h in hist)
    v_first = hist[0]["version"]
    table.compact(spark)
    with pytest.raises(FileNotFoundError, match="consumed"):
        table.read_changes_between(spark, v_first).collect()


def test_changelog_chains_to_downstream_replica(spark, workdir):
    """CDC chaining: a downstream replica built ONLY from changelog
    windows (one commit_delta per window) must resolve to the same
    state as the primary — the engine's output is itself a complete
    change feed. DDL-free feed so phys == logical schema."""
    import pyspark.sql.functions as F

    from cdc_spark.genlog import GenConfig, write_binlog

    d = f"{workdir}/chain_binlog"
    write_binlog(
        GenConfig(n_events=4000, n_docs=300, events_per_epoch=1000,
                  seed=13, ddl_schedule=()),
        d,
    )
    primary_dir = f"{workdir}/chain_primary"
    replica = TargetTable(f"{workdir}/chain_replica")
    replica.create_if_absent()
    versions = []
    for k in range(1, 5):
        primary = replay(spark, d, primary_dir, stop_after=k, lineage=False)
        versions.append(primary.state()["version"])
        # first window starts at the create entry (journal version 0)
        v_prev = versions[-2] if len(versions) > 1 else 0
        window = primary.read_changes_between(spark, v_prev, versions[-1])
        delta = window.withColumn(
            "deleted", F.col("_change_type") == "delete"
        ).drop("_change_type", "_epoch")
        replica.commit_delta(delta, epoch=k, stats=None)

    def _rows2(t):
        def _h(v):
            return tuple(v) if isinstance(v, list) else v

        return {
            tuple(sorted((k, _h(v)) for k, v in r.asDict().items()))
            for r in t.read_resolved(spark).collect()
        }

    primary = TargetTable(primary_dir)
    assert _rows2(replica) == _rows2(primary)
    assert len(_rows2(replica)) > 0
