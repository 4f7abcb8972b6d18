"""Single-threaded golden oracle applier (FIXTURES.md F4).

Replays a binlog (F1 parquet segments) in strict lsn order into a plain
Python dict keyed by doc_id — the trivially-correct reference the
distributed engine must match per-row (token-array equality). Mirrors
the reference's implied apply-and-replay test (docs/CDCHBase-sparksink.md
"Table Creation"/"Table Modification" walkthroughs; the reference ships
zero automated tests, SURVEY.md §5.1).

Semantics (shared contract with the engine):
- I/U are both full-image upserts (reference treats them identically,
  sink/CDCTableUtil.java:77-83); for U, fields named in missing_mask
  take the before-image value (Normalizer.java:190-207).
- extra maps merge after-over-before within the event; the stored row is
  the event's merged image (replacement, not accumulation).
- A PK-change update (before.doc_id != after.doc_id) is a delete of the
  old key + insert of the new (Normalizer.java:180-207,219-237).
- D removes the key (HBase Delete, CDCTableUtil.java:86-89); deleting an
  absent key is a no-op.
- DDL updates the column registry: add appends (nullable), rename keeps
  data and source_key, widen changes the cast type. Final projection
  casts extra[source_key] to the registry type under the registry name.
"""

from __future__ import annotations

import glob
import json

import pyarrow.parquet as pq

import numpy as _np

_CASTS = {
    "int": int,
    "long": int,
    # Spark FloatType is float32; round-trip through np.float32 so the
    # oracle's Python value is bit-identical to the engine's.
    "float": lambda s: float(_np.float32(s)),
    "double": float,
    "string": str,
    "boolean": lambda s: s in ("true", "True", "1"),
}


class Registry:
    """Ordered registry of DDL-added columns: [{target, source_key, type}]."""

    def __init__(self) -> None:
        self.cols: list[dict] = []

    def apply(self, kind: str, payload: str) -> None:
        p = json.loads(payload)
        if kind == "add_column":
            self.cols.append({"target": p["name"], "source_key": p["name"], "type": p["type"]})
        elif kind == "rename_column":
            for c in self.cols:
                if c["target"] == p["from"]:
                    c["target"] = p["to"]
                    return
            raise KeyError(f"rename: no column {p['from']}")
        elif kind == "widen_column":
            for c in self.cols:
                if c["target"] == p["name"]:
                    c["type"] = p["to"]
                    return
            raise KeyError(f"widen: no column {p['name']}")
        elif kind == "drop_column":
            for i, c in enumerate(self.cols):
                if c["target"] == p["name"]:
                    self.cols.pop(i)
                    return
            raise KeyError(f"drop: no column {p['name']}")
        else:
            raise ValueError(f"unknown ddl_kind {kind}")

    def snapshot(self) -> list[dict]:
        return [dict(c) for c in self.cols]


def _as_map(extra) -> dict:
    if extra is None:
        return {}
    if isinstance(extra, dict):
        return dict(extra)
    return dict(extra)  # pyarrow map -> list of (k, v)


def _merged_image(ev: dict) -> dict:
    """Full row image for an I/U event (before-fill per missing_mask)."""
    before = ev["before"] or {}
    after = ev["after"] or {}
    mask = set(ev["missing_mask"] or [])
    img = {}
    if ev["op_type"] == "U" and "tokens" in mask:
        img["tokens"] = before.get("tokens")
        img["n_tok"] = before.get("n_tok")
    else:
        img["tokens"] = after.get("tokens")
        img["n_tok"] = after.get("n_tok")
    if ev["op_type"] == "U" and "source" in mask:
        img["source"] = before.get("source")
    else:
        img["source"] = after.get("source")
    img["extra"] = {**_as_map(before.get("extra")), **_as_map(after.get("extra"))}
    return img


def _fetched_image(ev: dict, fetch_img: dict | None) -> dict:
    """Full row image for an I/U event in FETCH mode: fields the event
    did not supply come from the current stored image of the BEFORE key
    (the reference's CT shape — the feed carries keys, the row image is
    fetched from the base table, CTInputDStream.java:112-131). extra
    ACCUMULATES over the fetched image for updates; an insert replaces
    the row wholesale."""
    after = ev["after"] or {}
    mask = set(ev["missing_mask"] or [])
    img = {}
    if ev["op_type"] == "U" and "tokens" in mask:
        img["tokens"] = fetch_img.get("tokens") if fetch_img else None
        img["n_tok"] = fetch_img.get("n_tok") if fetch_img else None
    else:
        img["tokens"] = after.get("tokens")
        img["n_tok"] = after.get("n_tok")
    if ev["op_type"] == "U" and "source" in mask:
        img["source"] = fetch_img.get("source") if fetch_img else None
    else:
        img["source"] = after.get("source")
    if ev["op_type"] == "I":
        img["extra"] = _as_map(after.get("extra"))
    else:
        base = dict(fetch_img["extra"]) if fetch_img else {}
        img["extra"] = {**base, **_as_map(after.get("extra"))}
    return img


def replay_tables(
    segments: list[str] | str, images: str = "carry"
) -> dict[str, tuple[dict, Registry]]:
    """Replay segments (paths or glob) routing by the `table` column →
    {table_name: (state dict, registry)}.

    State values: {tokens, n_tok, source, extra(raw str map), last_lsn}.
    `images="carry"` (default): before-images ride the feed and masked
    update fields read from them. `images="fetch"`: the feed is key-only
    (genlog.to_keys_feed shape) and masked/base values come from the
    replayer's own state — the oracle twin of the engine's
    `images="fetch"` apply.
    A drop_column is data loss by design (reference CDCKudu.java:103-106):
    the dropped column's values are purged from every live row, so a
    later re-add starts from nulls — matching the engine's read-side
    registry mask."""
    if images not in ("carry", "fetch"):
        raise ValueError(f"unknown images mode {images!r}")
    if isinstance(segments, str):
        segments = sorted(glob.glob(segments))
    out: dict[str, tuple[dict, Registry]] = {}
    last_lsn = -1
    for seg in segments:
        tbl = pq.read_table(seg)
        for ev in tbl.to_pylist():
            assert ev["lsn"] > last_lsn, "binlog must be strictly lsn-ordered"
            last_lsn = ev["lsn"]
            op = ev["op_type"]
            if op == "H":  # heartbeat: no state effect (T10)
                continue
            state, reg = out.setdefault(ev["table"], ({}, Registry()))
            if op == "DDL":
                if ev["ddl_kind"] == "drop_column":
                    # default=None: an unknown column must surface as
                    # Registry.apply's KeyError (the engine's contract),
                    # not a bare StopIteration from the purge lookup
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
            if op not in ("I", "U", "D"):
                raise ValueError(f"unknown op_type {op!r} at lsn {ev['lsn']}")
            if op == "D":
                state.pop(ev["doc_id"], None)
                continue
            b = ev["before"] or {}
            a = ev["after"] or {}
            if images == "fetch":
                old_key = b.get("doc_id")
                img = _fetched_image(
                    ev, state.get(old_key) if old_key is not None else None
                )
            else:
                img = _merged_image(ev)
            if op == "U":
                if b.get("doc_id") is not None and b["doc_id"] != a["doc_id"]:
                    state.pop(b["doc_id"], None)  # PK change: D(old) + I(new)
            doc_id = (ev["after"] or {})["doc_id"]
            state[doc_id] = {**img, "last_lsn": ev["lsn"]}
    return out


def replay(segments: list[str] | str, images: str = "carry") -> tuple[dict, Registry]:
    """Single-table replay (the common fixture shape); raises if the
    feed routes to more than one table — use replay_tables then."""
    by_table = replay_tables(segments, images=images)
    if len(by_table) > 1:
        raise ValueError(f"multi-table feed {sorted(by_table)}; use replay_tables")
    if not by_table:
        return {}, Registry()
    return next(iter(by_table.values()))


def fill_images(keys_segments: list[str] | str, out_dir: str) -> list[str]:
    """Key-only feed → honest full-image twin: before-images become the
    replayer's CURRENT stored image of the before key (state-honest,
    unlike the synthetic-deterministic images of genlog's full mode).

    Purpose: pins the fetch path three ways — engine-fetch(keys) ==
    engine-carry(fill_images(keys)) == oracle(either) — because a
    carry-mode apply of the filled feed reads from before-images exactly
    what a fetch-mode apply of the keys feed reads from state."""
    import os

    import pyarrow as pa

    from cdc_spark.genlog import ARROW_CHANGE

    if isinstance(keys_segments, str):
        keys_segments = sorted(glob.glob(keys_segments))
    os.makedirs(out_dir, exist_ok=True)
    states: dict[str, dict] = {}
    regs: dict[str, Registry] = {}
    paths = []
    for seg in keys_segments:
        tbl = pq.read_table(seg)
        out_rows = []
        for ev in tbl.to_pylist():
            op = ev["op_type"]
            row = dict(ev)
            if op in ("U", "D"):
                state = states.setdefault(ev["table"], {})
                old_key = (ev["before"] or {}).get("doc_id")
                img = state.get(old_key) if old_key is not None else None
                row["before"] = {
                    "doc_id": old_key,
                    "tokens": list(img["tokens"]) if img and img["tokens"] is not None else None,
                    "n_tok": img["n_tok"] if img else None,
                    "source": img["source"] if img else None,
                    "extra": dict(img["extra"]) if img else {},
                } if old_key is not None else None
            out_rows.append(row)
            # advance state with fetch semantics (mirrors replay_tables)
            if op in ("H", "DDL"):
                if op == "DDL":
                    state = states.setdefault(ev["table"], {})
                    reg = regs.setdefault(ev["table"], Registry())
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
            state = states.setdefault(ev["table"], {})
            if op == "D":
                state.pop(ev["doc_id"], None)
                continue
            b = ev["before"] or {}
            old_key = b.get("doc_id")
            img = _fetched_image(ev, state.get(old_key) if old_key is not None else None)
            if op == "U" and old_key is not None and old_key != ev["after"]["doc_id"]:
                state.pop(old_key, None)
            state[ev["after"]["doc_id"]] = {**img, "last_lsn": ev["lsn"]}
        out = pa.Table.from_pylist(out_rows, schema=ARROW_CHANGE)
        p = os.path.join(out_dir, os.path.basename(seg))
        pq.write_table(out, p)
        paths.append(p)
    return paths


def final_rows(state: dict, reg: Registry) -> list[dict]:
    """Projected final table rows (F2 + registry extras), sorted by doc_id."""
    rows = []
    for doc_id in sorted(state):
        r = state[doc_id]
        row = {
            "doc_id": doc_id,
            "tokens": list(r["tokens"]) if r["tokens"] is not None else None,
            "n_tok": r["n_tok"],
            "source": r["source"],
            "last_lsn": r["last_lsn"],
        }
        for c in reg.cols:
            v = r["extra"].get(c["source_key"])
            row[c["target"]] = None if v is None else _CASTS[c["type"]](v)
        rows.append(row)
    return rows
