"""Deterministic synthetic binlog generator (FIXTURES.md F1).

Produces the ordered change feed the engine tails: I/U/D DML events with
before/after images + missing-mask (the reference's GoldenGate-shaped
records, source/oracle/Normalizer.java:160-217) and DDL events
(add/rename/widen column), written as one parquet "segment" per epoch —
the sandbox stand-in for a binlog/WAL (reference sources:
source/sqlserver/CTInputDStream.java:112-131 change-range scans,
source/oracle/GoldenGateKafka.java:112-240 Kafka tail).

Fully deterministic: seeded numpy Generator per epoch
(``default_rng([seed, epoch])``), no wall clock. Generation is chunked by
epoch so a 10^7-event log streams out in bounded memory; the 10^10
nominal scale is reached by raising ``n_events`` — same code path.

Semantics knobs (FIXTURES.md): Zipf-skewed hot keys, PK-change updates
(normalizer must emit D+I, reference Normalizer.java:180-207),
missing-mask updates (unchanged fields ride in the before image,
Normalizer.java:190-202). Before/after images are synthetic-deterministic
rather than state-honest: both the engine and the oracle apply from the
event itself (full-image replacement semantics, like the reference's
normalized records), so the two appliers agree by construction.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLE_NAME = "corpus.tokens"

ARROW_PAYLOAD = pa.struct(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
        ("extra", pa.map_(pa.string(), pa.string())),
    ]
)

ARROW_CHANGE = pa.schema(
    [
        ("lsn", pa.int64()),
        ("epoch", pa.int32()),
        ("table", pa.string()),
        ("op_type", pa.string()),
        ("primary_keys", pa.list_(pa.string())),
        ("doc_id", pa.string()),
        ("before", ARROW_PAYLOAD),
        ("after", ARROW_PAYLOAD),
        ("missing_mask", pa.list_(pa.string())),
        ("ddl_kind", pa.string()),
        ("ddl_payload", pa.string()),
    ]
)

#: Default DDL schedule: (fraction-of-stream, kind, payload-dict[, table-idx]).
#: Exercises all three evolution kinds of the north rule.
DEFAULT_DDL_SCHEDULE = (
    (0.20, "add_column", {"name": "quality", "type": "float"}),
    (0.35, "add_column", {"name": "rating", "type": "int"}),
    (0.55, "rename_column", {"from": "quality", "to": "quality_score"}),
    (0.75, "widen_column", {"name": "rating", "to": "long"}),
)

#: Adds drop + re-add (reference drops removed columns, CDCKudu.java:103-106):
#: `rating` is dropped mid-stream — its values stop riding the feed — then
#: re-added as a fresh column that only post-re-add events populate.
DDL_SCHEDULE_WITH_DROP = (
    (0.15, "add_column", {"name": "quality", "type": "float"}),
    (0.25, "add_column", {"name": "rating", "type": "int"}),
    (0.40, "rename_column", {"from": "quality", "to": "quality_score"}),
    (0.55, "drop_column", {"name": "rating"}),
    (0.70, "add_column", {"name": "rating", "type": "long"}),
)

SOURCES = np.array(["wiki", "web", "code", "books", "news"])


@dataclass(frozen=True)
class GenConfig:
    n_events: int = 10_000
    n_docs: int = 1_000
    events_per_epoch: int = 1_000
    p_insert: float = 0.40
    p_update: float = 0.40
    p_delete: float = 0.20
    zipf_s: float = 1.2
    p_pk_change: float = 0.05
    p_missing_tokens: float = 0.30
    p_missing_source: float = 0.30
    p_heartbeat: float = 0.0
    p_extra_value: float = 0.60
    tokens_min: int = 8
    tokens_max: int = 64
    vocab: int = 50_000
    seed: int = 42
    ddl_schedule: tuple = DEFAULT_DDL_SCHEDULE
    #: event routing targets (reference: per-CT-table processing,
    #: CTInputDStream.java:65-99); single-table configs are byte-identical
    #: to the pre-multi-table generator
    tables: tuple = (TABLE_NAME,)
    #: STATE-HONEST before-images (VERDICT r3 item #6): U/D events'
    #: before payloads are rewritten to the oracle applier's accumulated
    #: state at that lsn (None fields for keys with no live row — a
    #: shape the synthetic generator never emits), so carry-mode's
    #: before-image fill (T7) is exercised against real inter-event
    #: correlations. Pure post-processing AFTER all RNG draws — configs
    #: with the default False stay byte-identical. Test-fixture mode:
    #: the rewrite is a single-threaded Python pass per epoch.
    state_honest: bool = False

    @property
    def n_epochs(self) -> int:
        return (self.n_events + self.events_per_epoch - 1) // self.events_per_epoch


def ddl_events(cfg: GenConfig) -> list[tuple[int, str, str, int]]:
    """Resolved DDL schedule as (lsn, kind, payload_json, table_idx);
    lsns unique. 3-element schedule entries target table 0.

    DML lsns are 1-based dense; a DDL event takes over the lsn of the DML
    slot it displaces (collisions bump forward by one)."""
    seen: dict[int, tuple[int, str, str, int]] = {}
    for entry in cfg.ddl_schedule:
        frac, kind, payload = entry[:3]
        ti = entry[3] if len(entry) > 3 else 0
        lsn = max(1, min(cfg.n_events, int(cfg.n_events * frac)))
        while lsn in seen:
            lsn += 1
        seen[lsn] = (lsn, kind, json.dumps(payload, sort_keys=True), ti)
    return sorted(seen.values())


def extra_windows(cfg: GenConfig) -> list[tuple[int, int | None, str]]:
    """(add_lsn, end_lsn-or-None, source_key) emission windows for extra
    values: a value rides DML events with add_lsn < lsn (< end_lsn when
    the column was later dropped — the source stops emitting a dropped
    column, and a re-add opens a fresh window).

    Source keys never change on rename: the feed keeps emitting the
    original field name; rename applies to the *target* table only
    (mirrors GoldenGate, where the trail schema is source-side). Drops
    resolve by simulating each table's registry over the schedule."""
    regs: dict[int, list[dict]] = {}
    out: list[list] = []
    for lsn, kind, pj, ti in ddl_events(cfg):
        p = json.loads(pj)
        cols = regs.setdefault(ti, [])
        if kind == "add_column":
            out.append([lsn, None, p["name"]])
            cols.append({"target": p["name"], "win": len(out) - 1})
        elif kind == "rename_column":
            for c in cols:
                if c["target"] == p["from"]:
                    c["target"] = p["to"]
                    break
        elif kind == "drop_column":
            for i, c in enumerate(cols):
                if c["target"] == p["name"]:
                    out[c["win"]][1] = lsn
                    cols.pop(i)
                    break
    # overlapping windows for one key would build maps with duplicate keys
    open_spans: dict[str, int] = {}
    for a, e, k in sorted(out):
        if k in open_spans and (open_spans[k] is None or a < open_spans[k]):
            raise ValueError(f"overlapping extra-value windows for key {k!r}")
        open_spans[k] = e
    return [tuple(w) for w in out]


def added_extras(cfg: GenConfig) -> list[tuple[int, str]]:
    """(add_lsn, source_key) per add_column (window starts)."""
    return [(a, k) for a, _e, k in extra_windows(cfg)]


def _doc_strs(idx: np.ndarray) -> pa.Array:
    """Vectorized 'doc%08d' (np.char.mod costs µs/row; this is all C++):
    idx + 10^8 → '1XXXXXXXX' → replace first char with 'doc'."""
    import pyarrow.compute as pc

    s = pc.cast(pa.array(idx.astype(np.int64) + 100_000_000), pa.string())
    return _one_chunk(pc.utf8_replace_slice(s, start=0, stop=1, replacement="doc"))


def _dict_strs(indices: np.ndarray, values: list[str]) -> pa.Array:
    """Vectorized small-vocabulary string column via dictionary decode."""
    import pyarrow.compute as pc

    d = pa.DictionaryArray.from_arrays(
        pa.array(indices.astype(np.int32)), pa.array(values, type=pa.string())
    )
    return _one_chunk(pc.cast(d, pa.string()))


def _one_chunk(a):
    """pa.array() auto-chunks very large inputs; Struct/Map/List builders
    need contiguous Arrays (hit at multi-M-row epochs)."""
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def _payload_arrays(
    rng: np.random.Generator,
    cfg: GenConfig,
    lsns: np.ndarray,
    doc_idx: np.ndarray,
    valid: np.ndarray,
    extra_keys: list[tuple[int, int | None, str]],
) -> pa.StructArray:
    """Payload StructArray; rows where ~valid are null structs.

    Extra-column values appear only on events inside the column's
    emission window (add-DDL lsn, drop-DDL lsn) — so DML touches new
    columns both in the same epoch as the DDL and in later epochs
    (SURVEY.md §5.2 #4), and dropped columns vanish from the feed."""
    n = len(doc_idx)
    lens = rng.integers(cfg.tokens_min, cfg.tokens_max + 1, size=n).astype(np.int32)
    lens[~valid] = 0  # parquet forbids non-empty lists under null structs
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = rng.integers(0, cfg.vocab, size=int(offsets[-1]), dtype=np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(flat))
    n_tok = pa.array(lens, type=pa.int32())
    src = _dict_strs(rng.integers(0, len(SOURCES), size=n), list(SOURCES))
    doc_ids = _doc_strs(doc_idx)

    # vectorized map construction (the python double loop was the
    # generator bottleneck at multi-M-row epochs): mask matrix (n × keys)
    # → np.nonzero walks row-major, i.e. exactly map-entry order
    if extra_keys:
        carry = rng.random((n, len(extra_keys))) < cfg.p_extra_value
        raw = rng.integers(0, 100, size=(n, len(extra_keys)))
        add_lsns = np.array([al for al, _e, _k in extra_keys], dtype=np.int64)
        end_lsns = np.array(
            [np.iinfo(np.int64).max if e is None else e for _a, e, _k in extra_keys],
            dtype=np.int64,
        )
        mask = (
            carry & valid[:, None]
            & (lsns[:, None] > add_lsns[None, :])
            & (lsns[:, None] < end_lsns[None, :])
        )
        import pyarrow.compute as pc

        rows, cols = np.nonzero(mask)
        is_quality = np.array([k.startswith("quality") for _a, _e, k in extra_keys])
        picked = raw[rows, cols]
        # '%.2f' of picked/100 for picked in 0..99 ≡ '0.' + zero-padded
        # 2 digits: picked+100 → '1XX' → replace first char with '0.'
        qual_str = pc.utf8_replace_slice(
            pc.cast(pa.array(picked + 100), pa.string()), start=0, stop=1, replacement="0."
        )
        int_str = pc.cast(pa.array(picked), pa.string())
        vals = _one_chunk(pc.if_else(pa.array(is_quality[cols]), qual_str, int_str))
        moff = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(mask.sum(axis=1, dtype=np.int32), out=moff[1:])
        keys = _dict_strs(cols, [k for _a, _e, k in extra_keys])
    else:
        moff = np.zeros(n + 1, dtype=np.int32)
        keys = pa.array([], type=pa.string())
        vals = pa.array([], type=pa.string())
    extra = pa.MapArray.from_arrays(pa.array(moff), keys, vals)

    return pa.StructArray.from_arrays(
        [_one_chunk(a) for a in (doc_ids, tokens, n_tok, src, extra)],
        fields=list(ARROW_PAYLOAD),
        mask=pa.array(~valid),
    )


def generate_epoch(cfg: GenConfig, epoch: int) -> pa.Table:
    """Generate one epoch's segment deterministically."""
    rng = np.random.default_rng([cfg.seed, epoch])
    lo = epoch * cfg.events_per_epoch + 1  # lsn is 1-based
    hi = min((epoch + 1) * cfg.events_per_epoch, cfg.n_events)
    n = hi - lo + 1
    if n <= 0:
        raise ValueError(f"epoch {epoch} out of range")
    lsns = np.arange(lo, hi + 1, dtype=np.int64)

    ddl_map = {l: (k, pj, ti) for l, k, pj, ti in ddl_events(cfg) if lo <= l <= hi}
    is_ddl = np.isin(lsns, np.array(sorted(ddl_map), dtype=np.int64)) if ddl_map else np.zeros(n, bool)

    u = rng.random(n)
    ops = np.where(u < cfg.p_insert, "I", np.where(u < cfg.p_insert + cfg.p_update, "U", "D")).astype(object)
    ops[is_ddl] = "DDL"

    ranks = np.arange(1, cfg.n_docs + 1, dtype=np.float64)
    w = ranks ** (-cfg.zipf_s)
    cdf = np.cumsum(w / w.sum())
    doc_idx = np.searchsorted(cdf, rng.random(n), side="right")
    pk_change = (ops == "U") & (rng.random(n) < cfg.p_pk_change)
    after_idx = doc_idx.copy()
    npk = int(pk_change.sum())
    if npk:
        after_idx[pk_change] = (doc_idx[pk_change] + 1 + rng.integers(0, cfg.n_docs - 1, size=npk)) % cfg.n_docs

    is_i = ops == "I"
    is_u = ops == "U"
    is_d = ops == "D"

    extra_keys = extra_windows(cfg)
    before = _payload_arrays(rng, cfg, lsns, doc_idx, valid=(is_u | is_d), extra_keys=extra_keys)
    after = _payload_arrays(rng, cfg, lsns, after_idx, valid=(is_i | is_u), extra_keys=extra_keys)

    miss_tok = is_u & (rng.random(n) < cfg.p_missing_tokens)
    miss_src = is_u & (rng.random(n) < cfg.p_missing_source)
    if cfg.p_heartbeat > 0:
        # heartbeats (reference: GoldenGate generic-wrapper messages the
        # normalizer drops, Normalizer.java:68-72 / T10). Drawn LAST so a
        # p_heartbeat=0 config reproduces byte-identical pre-heartbeat
        # streams; the overwritten op's payloads stay in the row — the
        # engine must drop heartbeats regardless of what rides along.
        hb = (rng.random(n) < cfg.p_heartbeat) & ~is_ddl
        ops[hb] = "H"
    # vectorized list<string> build (entry order: tokens then source)
    mm_mask = np.stack([miss_tok, miss_src], axis=1)
    mm_rows, mm_cols = np.nonzero(mm_mask)
    mm_off = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(mm_mask.sum(axis=1, dtype=np.int32), out=mm_off[1:])
    missing_mask = pa.ListArray.from_arrays(
        pa.array(mm_off),
        _dict_strs(mm_cols, ["tokens", "source"]),
        mask=pa.array(~is_u),
    )
    pk_off = np.zeros(n + 1, dtype=np.int32)
    np.cumsum((~is_ddl).astype(np.int32), out=pk_off[1:])
    primary_keys = pa.ListArray.from_arrays(
        pa.array(pk_off),
        _dict_strs(np.zeros(int(pk_off[-1]), dtype=np.int32), ["doc_id"]),
        mask=pa.array(is_ddl),
    )

    import pyarrow.compute as pc

    top_doc = np.where(is_d, doc_idx, after_idx)
    doc_col = pc.if_else(pa.array(is_ddl), pa.scalar(None, pa.string()), _doc_strs(top_doc))
    ddl_kind_np = np.full(n, None, dtype=object)
    ddl_payload_np = np.full(n, None, dtype=object)
    for l, (k, pj, _ti) in ddl_map.items():
        ddl_kind_np[l - lo] = k
        ddl_payload_np[l - lo] = pj
    ddl_kind = pa.array(ddl_kind_np, type=pa.string())
    ddl_payload = pa.array(ddl_payload_np, type=pa.string())

    if len(cfg.tables) == 1:
        table_col = pa.array([cfg.tables[0]] * n)
    else:
        # drawn LAST (after every existing draw) so single-table configs
        # stay byte-identical; DML routes uniformly, DDL rows route to
        # their schedule entry's table
        tbl_idx = rng.integers(0, len(cfg.tables), size=n)
        for l, (_k, _pj, ti) in ddl_map.items():
            tbl_idx[l - lo] = ti
        table_col = _dict_strs(tbl_idx, list(cfg.tables))

    return pa.Table.from_arrays(
        [
            pa.array(lsns),
            pa.array(np.full(n, epoch, dtype=np.int32)),
            table_col,
            pa.array(ops.astype(str), type=pa.string()),
            primary_keys,
            doc_col,
            before,
            after,
            missing_mask,
            ddl_kind,
            ddl_payload,
        ],
        schema=ARROW_CHANGE,
    )


def _state_honest_rewrite(table: pa.Table, ctx: dict) -> pa.Table:
    """Rewrite one epoch's U/D before-images to the oracle applier's
    accumulated state at each lsn (cfg.state_honest).

    `ctx` maps table name → (state, Registry) and persists across
    epochs. The rewriter applies every event with the oracle's OWN
    carry-mode transition (oracle._merged_image, including drop-DDL
    purges), so when the oracle later replays the rewritten feed its
    state at each lsn equals the state these before-images were drawn
    from — the feed is self-consistent by construction."""
    from cdc_spark import oracle as _oracle

    rows = table.to_pylist()
    for ev in rows:
        op = ev["op_type"]
        if op == "H":
            continue
        state, reg = ctx.setdefault(ev["table"], ({}, _oracle.Registry()))
        if op == "DDL":
            if ev["ddl_kind"] == "drop_column":
                key = next(
                    (c["source_key"] for c in reg.cols
                     if c["target"] == json.loads(ev["ddl_payload"])["name"]),
                    None,
                )
                if key is not None:
                    for r in state.values():
                        r["extra"].pop(key, None)
            reg.apply(ev["ddl_kind"], ev["ddl_payload"])
            continue
        if op in ("U", "D"):
            old_key = (ev["before"] or {}).get("doc_id") or ev["doc_id"]
            st = state.get(old_key)
            ev["before"] = {
                "doc_id": old_key,
                "tokens": list(st["tokens"]) if st and st["tokens"] is not None else None,
                "n_tok": st["n_tok"] if st else None,
                "source": st["source"] if st else None,
                "extra": dict(st["extra"]) if st else {},
            }
        if op == "D":
            state.pop(ev["doc_id"], None)
            continue
        img = _oracle._merged_image(ev)
        a = ev["after"] or {}
        if op == "U":
            b_key = (ev["before"] or {}).get("doc_id")
            if b_key is not None and b_key != a["doc_id"]:
                state.pop(b_key, None)  # PK change: D(old) + I(new)
        state[a["doc_id"]] = {**img, "extra": dict(img["extra"])}
    return pa.Table.from_pylist(rows, schema=ARROW_CHANGE)


def write_binlog(cfg: GenConfig, outdir: str, parts: int = 1) -> list[str]:
    """Write one epoch per segment; returns segment paths.

    ``parts`` > 1 splits each epoch into that many contiguous-lsn part
    files (`segment-EEEEE-pPPP.parquet`) — a real binlog feed arrives as
    many files/partitions, and a single fat file caps the scan at one
    input split (the reference's single-partition debt, S8/O3, is
    exactly what our engine removes). Lexicographic file order remains
    strict lsn order, so the oracle applier is unaffected."""
    os.makedirs(outdir, exist_ok=True)
    paths = []
    manifest: dict[str, int] = {}
    honest_ctx: dict = {}
    for e in range(cfg.n_epochs):
        t = generate_epoch(cfg, e)
        if cfg.state_honest:
            t = _state_honest_rewrite(t, honest_ctx)
        if parts <= 1:
            p = os.path.join(outdir, f"segment-{e:05d}.parquet")
            pq.write_table(t, p)
            paths.append(p)
            manifest[str(e)] = 1
            continue
        n = t.num_rows
        step = (n + parts - 1) // parts
        n_written = 0
        for pi, lo in enumerate(range(0, n, step)):
            # 5-digit pad: lexicographic order must equal lsn order for
            # any realistic parts count (p1000 would sort before p999)
            p = os.path.join(outdir, f"segment-{e:05d}-p{pi:05d}.parquet")
            pq.write_table(t.slice(lo, step), p)
            paths.append(p)
            n_written += 1
        manifest[str(e)] = n_written
    # epoch manifest: files-per-segment ground truth, so a consumer of a
    # PARTIALLY-SYNCED copy of this feed can tell "segment not fully
    # arrived yet" (stage it) from "segment legitimately has fewer parts"
    # — a bare directory listing cannot. Segment bytes are unchanged.
    with open(os.path.join(outdir, "_manifest.json"), "w") as f:
        json.dump({"epochs": manifest}, f)
    return paths


# ---------------------------------------------------------------------------
# Key-only ("CT-shaped") feeds — reference source/sqlserver/CTInputDStream.java
# ---------------------------------------------------------------------------

def to_keys_feed(table: pa.Table) -> pa.Table:
    """Full-image epoch table → key-only ("CT-shaped") twin.

    The reference's primary source ships change KEYS, not images: SQL
    Server Change Tracking yields PKs + op and the row image is fetched
    by joining the base table (CTInputDStream.java:112-131 RIGHT OUTER
    image fetch). This transform reshapes a generated epoch the same
    way: before-images reduce to the PK alone (doc_id), and the after
    fields a masked update did not supply are nulled — the engine must
    recover them from its own resolved state (`images="fetch"`).
    Consumes NO randomness: the same draws, reshaped, so a keys feed is
    a pure function of the full feed."""
    import pyarrow.compute as pc

    n = table.num_rows
    op = table.column("op_type").combine_chunks()
    mask_l = _one_chunk(table.column("missing_mask"))
    is_u = np.asarray(pc.equal(op, "U").fill_null(False))
    # per-field masked flags (plain python over the mask lists: DDL/I/D
    # rows have null masks; epochs are bounded so this is not a hot path)
    masks = [set(m) if m is not None else set() for m in mask_l.to_pylist()]
    tok_masked = pa.array([bool(u) and "tokens" in m for u, m in zip(is_u, masks)])
    src_masked = pa.array([bool(u) and "source" in m for u, m in zip(is_u, masks)])

    def _null(t):
        return pa.nulls(n, t)

    empty_map = pa.MapArray.from_arrays(
        pa.array(np.zeros(n + 1, dtype=np.int32)),
        pa.array([], type=pa.string()),
        pa.array([], type=pa.string()),
    )
    b = _one_chunk(table.column("before"))
    before_keys = pa.StructArray.from_arrays(
        [
            _one_chunk(b.field("doc_id")),
            _null(pa.list_(pa.int32())),
            _null(pa.int32()),
            _null(pa.string()),
            empty_map,
        ],
        fields=list(ARROW_PAYLOAD),
        mask=_one_chunk(pc.is_null(b)),
    )
    a = _one_chunk(table.column("after"))
    after_keys = pa.StructArray.from_arrays(
        [
            _one_chunk(a.field("doc_id")),
            _one_chunk(pc.if_else(tok_masked, _null(pa.list_(pa.int32())), a.field("tokens"))),
            _one_chunk(pc.if_else(tok_masked, _null(pa.int32()), a.field("n_tok"))),
            _one_chunk(pc.if_else(src_masked, _null(pa.string()), a.field("source"))),
            _one_chunk(a.field("extra")),
        ],
        fields=list(ARROW_PAYLOAD),
        mask=_one_chunk(pc.is_null(a)),
    )
    arrays = []
    for f in ARROW_CHANGE:
        if f.name == "before":
            arrays.append(before_keys)
        elif f.name == "after":
            arrays.append(after_keys)
        else:
            arrays.append(_one_chunk(table.column(f.name)))
    return pa.Table.from_arrays(arrays, schema=ARROW_CHANGE)


def write_binlog_keys(cfg: GenConfig, outdir: str, parts: int = 1) -> list[str]:
    """write_binlog twin emitting the key-only feed (to_keys_feed of
    every epoch; same manifest semantics)."""
    os.makedirs(outdir, exist_ok=True)
    paths = []
    manifest: dict[str, int] = {}
    for e in range(cfg.n_epochs):
        t = to_keys_feed(generate_epoch(cfg, e))
        if parts <= 1:
            p = os.path.join(outdir, f"segment-{e:05d}.parquet")
            pq.write_table(t, p)
            paths.append(p)
            manifest[str(e)] = 1
            continue
        n = t.num_rows
        step = (n + parts - 1) // parts
        n_written = 0
        for pi, lo in enumerate(range(0, n, step)):
            p = os.path.join(outdir, f"segment-{e:05d}-p{pi:05d}.parquet")
            pq.write_table(t.slice(lo, step), p)
            paths.append(p)
            n_written += 1
        manifest[str(e)] = n_written
    with open(os.path.join(outdir, "_manifest.json"), "w") as f:
        json.dump({"epochs": manifest}, f)
    return paths
