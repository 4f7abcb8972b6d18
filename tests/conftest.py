from __future__ import annotations

import shutil
import tempfile

import pytest

from cdc_spark import oracle
from cdc_spark.genlog import GenConfig, write_binlog
from cdc_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="cdc_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def workdir():
    d = tempfile.mkdtemp(prefix="cdc_tests_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def small_cfg():
    return GenConfig(n_events=5000, n_docs=400, events_per_epoch=1000, seed=42)


@pytest.fixture(scope="session")
def small_binlog(workdir, small_cfg):
    d = f"{workdir}/binlog_small"
    write_binlog(small_cfg, d)
    return d


def rows_equal(oracle_rows: list[dict], engine_rows: list[dict]) -> list[str]:
    """Order-insensitive per-row comparison; returns list of diffs."""
    orc = {r["doc_id"]: r for r in oracle_rows}
    eng = {r["doc_id"]: r for r in engine_rows}
    diffs = []
    for k in set(orc) | set(eng):
        if k not in orc:
            diffs.append(f"extra row {k}")
            continue
        if k not in eng:
            diffs.append(f"missing row {k}")
            continue
        o, e = orc[k], eng[k]
        for col, ov in o.items():
            ev = e.get(col)
            if col == "tokens":
                ov = list(ov) if ov is not None else None
                ev = list(ev) if ev is not None else None
            if ov != ev:
                diffs.append(f"{k}.{col}: oracle={ov!r} engine={ev!r}")
    return diffs


def assert_matches_oracle(spark, table, binlog_dir):
    state, reg = oracle.replay(f"{binlog_dir}/segment-*.parquet")
    expected = oracle.final_rows(state, reg)
    actual = [r.asDict() for r in table.read_resolved(spark).collect()]
    diffs = rows_equal(expected, actual)
    assert not diffs, f"{len(diffs)} diffs, first 10: {diffs[:10]}"
