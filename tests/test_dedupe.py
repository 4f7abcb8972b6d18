"""LWW dedupe (O3): three strategies agree and pick the max-lsn row."""

import pytest
from pyspark.sql import Row

from cdc_spark.operators.dedupe import lww_dedupe


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        Row(lsn=i, epoch=0, doc_id=f"d{i % 7}", deleted=(i % 11 == 0), payload=i * 10)
        for i in range(1, 200)
    ]
    return spark.createDataFrame(rows)


@pytest.mark.parametrize("mode", ["agg", "window", "salted"])
def test_max_lsn_survives(spark, events, mode):
    out = lww_dedupe(events, mode=mode).collect()
    assert len(out) == 7
    by_doc = {r["doc_id"]: r for r in out}
    for d, r in by_doc.items():
        expect = max(i for i in range(1, 200) if f"d{i % 7}" == d)
        assert r["lsn"] == expect and r["payload"] == expect * 10


def test_modes_agree_on_real_feed(spark, small_binlog):
    from cdc_spark.operators.normalize import normalize
    from cdc_spark.streaming.pipeline import read_changes

    ev = normalize(read_changes(spark, small_binlog))
    results = {}
    for mode in ("agg", "window", "salted"):
        rows = lww_dedupe(ev, mode=mode).collect()
        results[mode] = {r["doc_id"]: (r["lsn"], r["deleted"], tuple(r["tokens"] or ())) for r in rows}
    assert results["agg"] == results["window"] == results["salted"]


def test_columns_preserved(spark, events):
    out = lww_dedupe(events, mode="agg")
    assert out.columns == events.columns
