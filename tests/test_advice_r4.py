"""Round-4 ADVICE regression pins.

1 (medium): legacy-base adoption must recompute base_max_lsn from the
   rewritten data when the journal had none — seeding it from delta_max
   alone understates the base maximum when a late-delivered epoch sits
   below legacy base lsns, silently corrupting the broadcast fast path's
   monotonicity proof (an older delta winner would unconditionally
   supersede a newer base row).
2 (low): journal-referenced delta/ref dirs missing on disk must fail
   loudly — silently skipping them returns state missing a committed
   epoch and the next compaction folds the loss into the base forever.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from cdc_spark.sinks.target import TargetTable

from tests.test_metadata_ddl import _delta


def test_legacy_base_adoption_recomputes_base_max_lsn(spark, tmp_path):
    t = TargetTable(str(tmp_path / "t"), compact_every=100)
    t.create_if_absent()
    _delta(spark, t, [{"doc_id": "a", "last_lsn": 50}], epoch=10)
    t.compact(spark)
    assert t.state()["base_max_lsn"] == 50

    # simulate a legacy journal written before base_max_lsn existed
    st = t.state()
    t._commit({**st, "version": st["version"] + 1, "kind": "legacy-sim",
               "base_max_lsn": None})

    # a late-delivered epoch BELOW the legacy base's lsns
    _delta(spark, t, [{"doc_id": "b", "last_lsn": 9, "tokens": [2]}], epoch=9)
    t.compact(spark)
    # the bug seeded base_max_lsn = delta_max = 9; the fix recomputes
    # over the rewritten base (which carries a@50)
    assert t.state()["base_max_lsn"] == 50

    # the understated bound would have approved the broadcast fast path
    # for this epoch (min_lsn 20 > 9) and let the OLDER image of "a"
    # supersede the newer base row — silent LWW corruption
    _delta(spark, t, [{"doc_id": "a", "last_lsn": 20, "tokens": [7]}], epoch=11)
    assert not t._fast_resolve_ok(t.state())
    rows = {r["doc_id"]: r.asDict() for r in t.read_resolved(spark).collect()}
    assert rows["a"]["last_lsn"] == 50 and rows["a"]["tokens"] == [1]
    assert rows["b"]["last_lsn"] == 9


def test_delta_bytes_recorded_at_commit_not_walked_at_read(
    spark, tmp_path, monkeypatch
):
    """The fast-path volume check reads journal-recorded delta sizes;
    a per-read filesystem walk would be an object-store LIST per query
    at scale (VERDICT r3 item #4)."""
    t = TargetTable(str(tmp_path / "t"), compact_every=100)
    t.create_if_absent()
    _delta(spark, t, [{"doc_id": "a", "last_lsn": 1}], epoch=0)
    st = t.state()
    walked = TargetTable._dir_bytes(
        os.path.join(t.path, "delta", "epoch=00000000")
    )
    assert st["delta_bytes"] == {"0": walked} and walked > 0

    def boom(path):
        raise AssertionError("filesystem walk on the read path")

    monkeypatch.setattr(TargetTable, "_dir_bytes", staticmethod(boom))
    rows = t.read_resolved(spark).collect()
    assert len(rows) == 1


def test_missing_journal_referenced_delta_dir_fails_loudly(spark, tmp_path):
    t = TargetTable(str(tmp_path / "t"), compact_every=100)
    t.create_if_absent()
    _delta(spark, t, [{"doc_id": "a", "last_lsn": 1}], epoch=0)
    _delta(spark, t, [{"doc_id": "b", "last_lsn": 2}], epoch=1)
    # lose a committed epoch dir (bad sweep / manual cleanup)
    shutil.rmtree(os.path.join(t.path, "delta", "epoch=00000001"))
    with pytest.raises(FileNotFoundError, match="committed data is missing"):
        t.read_resolved(spark).collect()


def test_missing_ref_delta_dir_fails_loudly(spark, tmp_path):
    t = TargetTable(str(tmp_path / "t"), compact_every=100)
    t.create_if_absent()
    # journal-only ref commit pointing at a staged slice, then lose it
    stage = tmp_path / "stage" / "epoch=00000000" / "table=t"
    stage.mkdir(parents=True)
    from cdc_spark.schema import APPLY_SCHEMA

    spark.createDataFrame(
        [(1, 0, "a", False, [1], 1, "s", {})],
        schema=APPLY_SCHEMA,
    ).write.mode("overwrite").parquet(str(stage))
    t.commit_delta_ref(spark, 0, str(stage),
                       stats={"n_events": 1, "min_lsn": 1, "max_lsn": 1})
    shutil.rmtree(str(stage))
    with pytest.raises(FileNotFoundError, match="committed data is missing"):
        t.read_resolved(spark).collect()
