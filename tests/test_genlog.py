"""Generator invariants: determinism, ordering, DDL schedule."""

import pyarrow.parquet as pq

from cdc_spark.genlog import GenConfig, ddl_events, generate_epoch


def test_deterministic():
    cfg = GenConfig(n_events=2000, n_docs=100, events_per_epoch=500)
    assert generate_epoch(cfg, 1).equals(generate_epoch(cfg, 1))


def test_lsn_strictly_increasing_and_dense(small_binlog):
    import glob

    last = 0
    for seg in sorted(glob.glob(f"{small_binlog}/segment-*.parquet")):
        for lsn in pq.read_table(seg, columns=["lsn"]).column("lsn").to_pylist():
            assert lsn == last + 1
            last = lsn


def test_ddl_schedule_all_kinds(small_cfg):
    kinds = [k for _, k, _, _ in ddl_events(small_cfg)]
    assert kinds.count("add_column") == 2
    assert "rename_column" in kinds and "widen_column" in kinds


def test_pk_change_updates_exist(small_binlog, small_cfg):
    import glob

    n_pk_change = 0
    for seg in sorted(glob.glob(f"{small_binlog}/segment-*.parquet")):
        for ev in pq.read_table(seg).to_pylist():
            if ev["op_type"] == "U" and ev["before"]["doc_id"] != ev["after"]["doc_id"]:
                n_pk_change += 1
            if ev["op_type"] in ("I", "U"):
                a = ev["after"]
                assert a["n_tok"] == len(a["tokens"])
    assert n_pk_change > 0


def test_extras_only_after_add_lsn(small_binlog, small_cfg):
    import glob

    from cdc_spark.genlog import added_extras

    adds = dict((k, l) for l, k in added_extras(small_cfg))
    for seg in sorted(glob.glob(f"{small_binlog}/segment-*.parquet")):
        for ev in pq.read_table(seg).to_pylist():
            for img in (ev["before"], ev["after"]):
                if img is None:
                    continue
                for k, _ in img["extra"]:
                    assert ev["lsn"] > adds[k]
