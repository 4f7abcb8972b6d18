"""Schema evolution (K3): add/rename/widen applied before dependent DML
(reference: DDL-before-DML sort CTSQLServer.java:108-114; Kudu alter
sink/CDCKudu.java:68-126). Rename preserves data — a deliberate,
test-pinned divergence from the reference's rename-as-drop+add data loss
(CDCKudu.java:91-102; SURVEY.md §7.3)."""

import json

import pytest

from cdc_spark.genlog import GenConfig, write_binlog
from cdc_spark.sinks.target import TargetTable
from cdc_spark.streaming.pipeline import replay
from tests.conftest import assert_matches_oracle


def test_final_schema_reflects_all_ddl(spark, small_binlog, workdir):
    table = replay(spark, small_binlog, f"{workdir}/t_ddl")
    df = table.read_resolved(spark)
    # schedule: add quality:float, add rating:int, rename quality->quality_score,
    # widen rating int->long
    assert "quality_score" in df.columns and "quality" not in df.columns
    types = dict(df.dtypes)
    assert types["quality_score"] == "float"
    assert types["rating"] == "bigint"


def test_rename_preserves_column_data(spark, workdir):
    """Values written under the old name survive the rename."""
    cfg = GenConfig(
        n_events=3000, n_docs=200, events_per_epoch=500, seed=11,
        ddl_schedule=(
            (0.10, "add_column", {"name": "quality", "type": "float"}),
            (0.90, "rename_column", {"from": "quality", "to": "q2"}),
        ),
    )
    d = f"{workdir}/binlog_rename"
    write_binlog(cfg, d)
    table = replay(spark, d, f"{workdir}/t_rename")
    df = table.read_resolved(spark)
    assert "q2" in df.columns
    assert df.filter(df.q2.isNotNull()).count() > 0  # data survived
    assert_matches_oracle(spark, table, d)


def test_widen_recasts_existing_values(spark, workdir):
    cfg = GenConfig(
        n_events=2000, n_docs=150, events_per_epoch=500, seed=13,
        ddl_schedule=(
            (0.10, "add_column", {"name": "rating", "type": "int"}),
            (0.80, "widen_column", {"name": "rating", "to": "long"}),
        ),
    )
    d = f"{workdir}/binlog_widen"
    write_binlog(cfg, d)
    table = replay(spark, d, f"{workdir}/t_widen")
    df = table.read_resolved(spark)
    assert dict(df.dtypes)["rating"] == "bigint"
    assert_matches_oracle(spark, table, d)


def test_illegal_widening_rejected(spark, workdir):
    tdir = f"{workdir}/t_illegal"
    t = TargetTable(tdir)
    t.create_if_absent()
    t.apply_ddl(spark, "add_column", json.dumps({"name": "s", "type": "string"}), "0:1")
    with pytest.raises(ValueError, match="illegal widening"):
        t.apply_ddl(spark, "widen_column", json.dumps({"name": "s", "to": "int"}), "0:2")


def test_ddl_idempotent_by_id(spark, workdir):
    tdir = f"{workdir}/t_ddl_idem"
    t = TargetTable(tdir)
    t.create_if_absent()
    payload = json.dumps({"name": "q", "type": "float"})
    t.apply_ddl(spark, "add_column", payload, "0:5")
    t.apply_ddl(spark, "add_column", payload, "0:5")  # re-delivery
    assert len(t.state()["registry"]) == 1


def test_dml_touches_new_column_same_and_later_batch(spark, small_binlog, workdir):
    """Events after the add-DDL (same epoch and later) carry extra values
    that land in the new column; events before it yield nulls."""
    table = replay(spark, small_binlog, f"{workdir}/t_touch")
    df = table.read_resolved(spark)
    assert df.filter(df.quality_score.isNotNull()).count() > 0
    assert df.filter(df.rating.isNotNull()).count() > 0


def test_drop_column_then_readd_starts_from_nulls(spark, workdir):
    """add → drop → re-add (reference drops removed columns,
    CDCKudu.java:103-106): the drop compacts the column away, the re-add
    starts from nulls, and the full replay still matches the oracle."""
    from cdc_spark.genlog import DDL_SCHEDULE_WITH_DROP

    cfg = GenConfig(
        n_events=4000, n_docs=300, events_per_epoch=1000, seed=17,
        ddl_schedule=DDL_SCHEDULE_WITH_DROP,
    )
    d = f"{workdir}/binlog_drop"
    write_binlog(cfg, d)
    table = replay(spark, d, f"{workdir}/t_drop")
    df = table.read_resolved(spark)
    types = dict(df.dtypes)
    assert types["rating"] == "bigint"  # the re-added long, not the old int
    rows = df.collect()
    drop_lsn = int(4000 * 0.55)
    stale = [r for r in rows if r["last_lsn"] <= drop_lsn]
    assert stale and all(r["rating"] is None for r in stale)
    assert any(r["rating"] is not None for r in rows)
    assert_matches_oracle(spark, table, d)


def test_drop_unknown_column_fails(spark, workdir, small_binlog):
    table = replay(spark, small_binlog, f"{workdir}/t_drop_unknown", stop_after=1)
    with pytest.raises(KeyError, match="drop: no column"):
        table.apply_ddl(spark, "drop_column", json.dumps({"name": "nope"}), ddl_id="x:1")
