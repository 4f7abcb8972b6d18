"""Budgeted inline compaction (VERDICT r3 item #2).

At 100 TB an inline compaction tick on a mostly-dirty table stalls that
epoch's stream for the full rewrite. With `inline_compact_budget=N` the
commit-path tick rewrites only the N dirtiest buckets and carries the
unconsumed delta rows forward — apply latency is bounded by
O(budget buckets + delta), and the maintenance `compact()` entry point
(the Iceberg rewrite_data_files analogue) runs the full pass."""

from __future__ import annotations

import os

from cdc_spark.sinks.target import TargetTable

from tests.test_metadata_ddl import _delta


def _bucket_inodes(base_dir: str) -> dict[str, set[int]]:
    out: dict[str, set[int]] = {}
    for child in os.listdir(base_dir):
        if not child.startswith("_bucket="):
            continue
        d = os.path.join(base_dir, child)
        out[child] = {
            os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if os.path.isfile(os.path.join(d, f)) and not f.startswith("_")
        }
    return out


def _feed(spark, t: TargetTable, docs: int, epoch: int, lsn0: int):
    _delta(
        spark, t,
        [{"doc_id": f"d{i:03d}", "last_lsn": lsn0 + i, "tokens": [lsn0 + i]}
         for i in range(docs)],
        epoch=epoch,
    )


def test_budgeted_tick_bounds_rewrite_and_preserves_results(spark, tmp_path):
    docs = 40
    budget = 2
    t = TargetTable(str(tmp_path / "t"), compact_every=2, buckets=8,
                    inline_compact_budget=budget)
    t.create_if_absent()
    # unbudgeted twin fed identically — results must match exactly
    u = TargetTable(str(tmp_path / "u"), compact_every=2, buckets=8)
    u.create_if_absent()
    for tab in (t, u):
        _feed(spark, tab, docs, epoch=0, lsn0=1)
        _feed(spark, tab, docs, epoch=1, lsn0=101)  # tick 1: adopts layout
    st = t.state()
    assert st["base_version"] and not st.get("carry_deltas")
    before = _bucket_inodes(os.path.join(t.path, "base", f"v{st['base_version']:08d}"))
    assert len(before) > budget, "fixture must be mostly dirty"

    # every bucket dirty again → the budgeted tick (at epoch 3) must
    # rewrite only `budget` buckets and carry the rest
    for tab in (t, u):
        _feed(spark, tab, docs, epoch=2, lsn0=201)
        _feed(spark, tab, docs, epoch=3, lsn0=301)
    st = t.state()
    assert len(st.get("carry_deltas", [])) == 1
    after = _bucket_inodes(os.path.join(t.path, "base", f"v{st['base_version']:08d}"))
    rewritten = [b for b, inos in after.items() if not inos <= before.get(b, set())]
    assert len(rewritten) == budget, (
        f"budgeted tick rewrote {len(rewritten)} buckets, budget={budget}"
    )
    # carries KEEP the broadcast fast path (VERDICT r4 #3): the per-bucket
    # base_max map proves every carried row supersedes its own bucket's
    # (un-rewritten) base rows — the base streams through a broadcast
    # LeftAnti instead of a full-table aggregate; results still exact
    assert t._fast_resolve_ok(st)
    assert st["carry_bucket_min"] and st["base_max_by_bucket"]
    from cdc_spark.plans.inspect import formatted_plan

    plan = formatted_plan(t.read_resolved(spark))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    got = {r["doc_id"]: r.asDict() for r in t.read_resolved(spark).collect()}
    want = {r["doc_id"]: r.asDict() for r in u.read_resolved(spark).collect()}
    assert got == want and len(got) == docs
    assert all(v["last_lsn"] >= 301 for v in got.values())

    # ...and a LATE epoch (lsn below the rewritten buckets' base max)
    # must still invalidate the proof and fall back to the full aggregate
    late = dict(st)
    late["epoch_stats"] = {
        **st.get("epoch_stats", {}),
        "99": {"n_events": 1, "min_lsn": 5, "max_lsn": 5},
    }
    late["delta_epochs"] = list(st["delta_epochs"]) + [99]
    assert not t._fast_resolve_ok(late)
    # legacy carries (no per-bucket records) must also fall back
    legacy = {k: v for k, v in st.items()
              if k not in ("carry_bucket_min", "base_max_by_bucket")}
    assert not t._fast_resolve_ok(legacy)

    # carried buckets rank dirtiest next tick → monotone catch-up; the
    # maintenance full pass drains every carry and restores the fast path
    _feed(spark, t, docs, epoch=4, lsn0=401)
    _feed(spark, t, docs, epoch=5, lsn0=501)  # budgeted tick 2
    assert t.state().get("carry_deltas")
    entry = t.compact(spark)
    assert entry["carry_deltas"] == [] and entry["delta_epochs"] == []
    assert t._fast_resolve_ok(t.state())
    got = {r["doc_id"]: r["last_lsn"] for r in t.read_resolved(spark).collect()}
    assert got == {f"d{i:03d}": 501 + i for i in range(docs)}
    # carry dirs were consumed and GC'd
    assert not any(
        c.startswith("carry-") for c in os.listdir(os.path.join(t.path, "delta"))
    )
