"""State-honest generator mode (VERDICT r3 item #6).

The default generator draws before-images synthetically, so carry-mode's
before-image fill (T7) was never exercised against ACCUMULATED state:
in particular, a masked update on a key with no live row (deleted or
never inserted) never appeared — its before fields were always
populated. state_honest=True derives U/D before-images from the oracle
applier's state at that lsn, producing exactly those shapes, and these
tests prove (a) the engine still matches the oracle on such a feed and
(b) the new fixture detects a merge-logic mutation the old one cannot.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from cdc_spark import oracle
from cdc_spark.genlog import DDL_SCHEDULE_WITH_DROP, GenConfig, write_binlog

CFG = dict(n_events=4_000, n_docs=250, events_per_epoch=1_000, seed=7,
           p_delete=0.3, ddl_schedule=DDL_SCHEDULE_WITH_DROP)


@pytest.fixture(scope="module")
def feeds(tmp_path_factory):
    root = tmp_path_factory.mktemp("honest")
    write_binlog(GenConfig(**CFG), str(root / "plain"))
    write_binlog(GenConfig(**CFG, state_honest=True), str(root / "honest"))
    return root


def _rows(binlog) -> list[dict]:
    import glob

    out = []
    for seg in sorted(glob.glob(f"{binlog}/segment-*.parquet")):
        out.extend(pq.read_table(seg).to_pylist())
    return out


def _absent_masked(rows) -> list[dict]:
    """Masked updates whose before-image has no live tokens — the shape
    only the state-honest feed produces."""
    return [
        ev for ev in rows
        if ev["op_type"] == "U"
        and "tokens" in (ev["missing_mask"] or [])
        and (ev["before"] or {}).get("tokens") is None
    ]


def _mutate(rows) -> list[dict]:
    """The deliberate T7 merge mutation: when a masked field's before
    value is null, fall back to the after value (a coalesce-style merge
    bug). Expressed as the equivalent feed transform: drop 'tokens' from
    missing_mask where before.tokens is null."""
    out = []
    for ev in rows:
        ev = dict(ev)
        if ev in _absent_masked([ev]):
            ev["missing_mask"] = [m for m in ev["missing_mask"] if m != "tokens"]
        out.append(ev)
    return out


def _final(rows) -> dict:
    """Oracle final state for a list of event dicts (single table)."""
    state: dict = {}
    reg = oracle.Registry()
    import json as _json

    for ev in rows:
        op = ev["op_type"]
        if op == "H":
            continue
        if op == "DDL":
            if ev["ddl_kind"] == "drop_column":
                key = next(
                    (c["source_key"] for c in reg.cols
                     if c["target"] == _json.loads(ev["ddl_payload"])["name"]),
                    None,
                )
                if key is not None:
                    for r in state.values():
                        r["extra"].pop(key, None)
            reg.apply(ev["ddl_kind"], ev["ddl_payload"])
            continue
        if op == "D":
            state.pop(ev["doc_id"], None)
            continue
        img = oracle._merged_image(ev)
        b, a = ev["before"] or {}, ev["after"] or {}
        if op == "U" and b.get("doc_id") not in (None, a["doc_id"]):
            state.pop(b["doc_id"], None)
        state[a["doc_id"]] = {**img, "last_lsn": ev["lsn"]}
    return state


def test_honest_feed_has_absent_key_masked_updates(feeds):
    assert not _absent_masked(_rows(feeds / "plain")), (
        "synthetic feed should never produce them (the coverage gap)"
    )
    assert len(_absent_masked(_rows(feeds / "honest"))) > 0


def test_honest_before_images_equal_oracle_state(feeds):
    """Self-consistency: replaying the honest feed with an independent
    oracle-transition fold, every U/D event's before-image equals the
    oracle state of its key just before that lsn."""
    import json as _json

    rows = _rows(feeds / "honest")
    state: dict = {}
    reg = oracle.Registry()
    checked = 0
    for ev in rows:
        op = ev["op_type"]
        if op == "H":
            continue
        if op == "DDL":
            if ev["ddl_kind"] == "drop_column":
                key = next(
                    (c["source_key"] for c in reg.cols
                     if c["target"] == _json.loads(ev["ddl_payload"])["name"]),
                    None,
                )
                if key is not None:
                    for r in state.values():
                        r["extra"].pop(key, None)
            reg.apply(ev["ddl_kind"], ev["ddl_payload"])
            continue
        if op in ("U", "D"):
            b = ev["before"]
            st = state.get(b["doc_id"])
            assert b["tokens"] == (st["tokens"] if st else None), ev["lsn"]
            assert b["n_tok"] == (st["n_tok"] if st else None)
            assert b["source"] == (st["source"] if st else None)
            assert dict(b["extra"] or {}) == (dict(st["extra"]) if st else {})
            checked += 1
        if op == "D":
            state.pop(ev["doc_id"], None)
        else:
            img = oracle._merged_image(ev)
            b, a = ev["before"] or {}, ev["after"] or {}
            if op == "U" and b.get("doc_id") not in (None, a["doc_id"]):
                state.pop(b["doc_id"], None)
            state[a["doc_id"]] = img
    assert checked > 200


def test_mutation_detected_only_by_honest_fixture(feeds):
    """The coalesce-style merge mutation is a NO-OP on the synthetic
    feed (no absent-key masked updates exist to trigger it) but flips
    final rows on the state-honest feed — the new fixture detects what
    the old one cannot."""
    plain = _rows(feeds / "plain")
    assert _final(_mutate(plain)) == _final(plain)
    honest = _rows(feeds / "honest")
    assert _final(_mutate(honest)) != _final(honest)


def test_engine_matches_oracle_on_state_honest_feed(spark, tmp_path):
    """Carry goldens on a state-honest feed: full engine replay equals
    the oracle applier row-for-row."""
    from cdc_spark.sinks.target import TargetTable
    from cdc_spark.streaming.pipeline import replay

    binlog = str(tmp_path / "binlog")
    write_binlog(GenConfig(**CFG, state_honest=True), binlog)
    table = replay(spark, binlog, str(tmp_path / "table"), lineage=False)
    state, reg = oracle.replay(f"{binlog}/segment-*.parquet")
    expected = {r["doc_id"]: r for r in oracle.final_rows(state, reg)}
    actual = {r["doc_id"]: r.asDict()
              for r in table.read_resolved(spark).collect()}
    assert set(expected) == set(actual)
    for k, exp in expected.items():
        got = actual[k]
        for col, v in exp.items():
            gv = got.get(col)
            if col == "tokens":
                v = list(v) if v is not None else None
                gv = list(gv) if gv is not None else None
            assert gv == v, (k, col, v, gv)
