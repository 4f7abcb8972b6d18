"""Key-only change feeds: row-image fetch against the engine's own state.

The reference's PRIMARY source ships change keys, not images: SQL Server
Change Tracking yields PKs + op per change and the pipeline fetches row
images by RIGHT-OUTER-joining the base table on the PK
(source/sqlserver/CTInputDStream.java:112-131). This module is that
operator re-expressed Spark-first, with the engine's own resolved table
as the image source (`apply_batch(images="fetch")`): an update that did
not supply a field (missing_mask) takes the field's CURRENT value —
from an earlier event in the same epoch if one set it, else from the
pre-epoch table state — and `extra` values accumulate onto the stored
row instead of riding full before-images.

Dataflow (per epoch):

1. `normalize_fetch` — change rows → setter-flagged apply events, pure
   column expressions (PK-change still explodes to D+I, T8).
2. Cross-key chains — a PK-change copies unsupplied fields from the
   OLD key's image: resolved in ONE distributed pass. Only the tiny
   (doc_id, base_key) edge set is driver-collected (capped); the
   driver union-finds it into chain components and each component's
   timelines + queries co-partition, so even transitive chains resolve
   with cheap local refolds inside the partition kernel — no
   per-round Spark jobs, no driver re-injection. Zero extra state
   reads. An epoch whose stats prove zero PK-changes skips the pass
   (and even its probe job) entirely.
3. `fetch_winners` — per-key sequential replay as ONE Arrow-batched
   `mapInPandas` pass per hash partition of doc_id (one shuffle — the
   same exchange the LWW dedupe pays in carry mode; partition-level
   batching instead of a per-key UDF, whose per-group pandas overhead
   dominates at 10^5 keys/epoch). Emits each key's winning image plus
   need-from-state flags. (Per-key order is a sequential fold, so hot
   keys cannot salt here — but `fetch_winners_auto` dispatches a
   DOMINANT timeline (sampled top-key share ≥30%) to the parallel-
   prefix tree fold `fetch_winners_tree`, which composes segmented
   partial transitions instead of serializing the hot key in one
   task.)
4. `fetch_delta` — winners needing pre-epoch state LEFT-join the
   resolved table filtered through a broadcast semi-join of the needy
   keys: the 100-TB table streams, never shuffles, exactly like the
   reference's per-batch base-table join. Typed column merge (no
   string round-trips), then the standard delta commit.

Caps: only the cross-key EDGE pairs (two strings per PK-change) are
ever driver-collected; timelines, answers, and resolved literal events
all stay distributed. PK-change chains are a tiny fraction of real
feeds; an epoch above `_PENDING_MAX` edges DEGRADES with a logged note
(the union-find is O(pendings) short strings — a mass re-key migration
at 0.05% of a 100M-event epoch is legitimate), and only a feed above
`_PENDING_HARD_MAX` (where the edge set itself threatens driver
memory) fails loudly rather than OOMing the driver.
"""

from __future__ import annotations

import logging

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_spark.caching import track_persist
from cdc_spark.sinks.target import norm_registry
from cdc_spark.schema import SPARK_TYPE

_LOG = logging.getLogger(__name__)

#: SOFT cap — above this many cross-key (PK-change) edges in one epoch
#: the resolver logs a degradation warning (driver union-find time and
#: edge-collect volume grow linearly) but keeps going: refusing a mass
#: re-key migration outright (the round-4 behavior) turned 0.05% of a
#: 100M-event epoch into a dead stream
_PENDING_MAX = 50_000
#: HARD cap — the edge set is two short strings per pending (~100 B);
#: 5M edges ≈ hundreds of MB of driver heap, the honest refusal point
#: for a feed whose "PK changes" are clearly not PK changes
_PENDING_HARD_MAX = 5_000_000

#: queried keys per resolve-kernel partition: the chain-resolve shuffle
#: is sized to the PENDING workload, not the session's shuffle default —
#: a handful of pendings must not fan out into (cluster-default) mostly
#: empty mapInPandas tasks, each paying a Python-worker round trip
#: (measured: on a host with degraded fork/IPC, 32 near-empty kernel
#: tasks for 10k pendings cost ~30% of a 500k-event epoch). Small
#: enough that a hot queried key's (inherently serial) fold does not
#: also serialize unrelated components behind it; grows with the
#: pending set, capped at the session parallelism.
_QUERIED_PER_PART = 128

#: epoch DML rows per winners-fold partition: the fold exchange is
#: likewise sized to the epoch (ceil(n_events/this), uncapped — a
#: 100M-event epoch legitimately wants more folds than the session
#: default, bounding each task's pandas slice; a 500k-event epoch
#: wants ~8, not a cluster-sized fan-out of tiny Python tasks).
_EVENTS_PER_FOLD_PART = 65_536

#: above this many needy keys, the fetched-image set (full rows with
#: token arrays) may not fit an executor broadcast — the image join
#: degrades to a shuffled join of O(needy) state rows (the broadcast
#: semi still prunes the state scan; the full table never shuffles)
_IMAGE_BROADCAST_CAP = 200_000
#: above this many needy keys, even the keys-only semi filter is too
#: big to broadcast; the state-pruning semi join then shuffles too —
#: an epoch touching that many distinct keys pays a state exchange
#: proportional to itself, which is the honest floor for a fetch feed
_SEMI_BROADCAST_CAP = 4_000_000

#: phase-A/B event shape consumed by the per-key replay
FETCH_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("epoch", T.IntegerType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("extra", T.MapType(T.StringType(), T.StringType())),
        T.StructField("set_tokens", T.BooleanType()),
        T.StructField("set_source", T.BooleanType()),
        T.StructField("reset", T.BooleanType()),
        T.StructField("base_key", T.StringType()),
    ]
)

#: FETCH_EVENT_SCHEMA field names, in order
_NAMES = [f.name for f in FETCH_EVENT_SCHEMA.fields]

WINNER_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("epoch", T.IntegerType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("extra", T.MapType(T.StringType(), T.StringType())),
        T.StructField("need_tokens", T.BooleanType()),
        T.StructField("need_source", T.BooleanType()),
        T.StructField("need_extra", T.BooleanType()),
        T.StructField("state_key", T.StringType()),
    ]
)

_EMPTY_MAP = "cast(map() as map<string,string>)"

#: Arrow twin of FETCH_EVENT_SCHEMA — the driver↔JVM hops in
#: resolve_cross_key (re-injecting resolved pendings) go through
#: `createDataFrame(pyarrow.Table)`, which skips the per-row pickle
#: path (measured ~2.5× faster on 10k nested rows; the hop is serial
#: driver work, so it is the scaling-efficiency term worth shaving)
_ARROW_FETCH_EVENT = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("epoch", pa.int32()),
        pa.field("doc_id", pa.string()),
        pa.field("deleted", pa.bool_()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
        pa.field("extra", pa.map_(pa.string(), pa.string())),
        pa.field("set_tokens", pa.bool_()),
        pa.field("set_source", pa.bool_()),
        pa.field("reset", pa.bool_()),
        pa.field("base_key", pa.string()),
    ]
)


def _events_df(spark: SparkSession, dicts, names) -> DataFrame:
    """FETCH_EVENT dicts → DataFrame via the Arrow fast path."""
    rows = [{n: d[n] for n in names} for d in dicts]
    return spark.createDataFrame(pa.Table.from_pylist(rows, schema=_ARROW_FETCH_EVENT))


def normalize_fetch(changes: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """CHANGE_SCHEMA rows (key-only wire) → setter-flagged fetch events.

    set_tokens/set_source mark fields the event SUPPLIES; reset marks a
    row-image restart (I, or the I-half of a PK-change split, whose
    image base is the OLD key — base_key). `keep` carries extra
    top-level columns through (the multi-table router keeps `table` so
    one staging job can partition the whole epoch's events)."""
    dml = changes.filter(F.col("op_type").isin("I", "U", "D"))
    masked = lambda f: (F.col("op_type") == "U") & F.array_contains(  # noqa: E731
        F.coalesce(F.col("missing_mask"), F.array().cast("array<string>")), f
    )
    pk_changed = (
        (F.col("op_type") == "U")
        & F.col("before.doc_id").isNotNull()
        & (F.col("before.doc_id") != F.col("after.doc_id"))
    )

    def delete_evt(key):
        return F.struct(
            F.col("lsn"), F.col("epoch"), key.alias("doc_id"),
            F.lit(True).alias("deleted"),
            F.lit(None).cast("array<int>").alias("tokens"),
            F.lit(None).cast("int").alias("n_tok"),
            F.lit(None).cast("string").alias("source"),
            F.lit(None).cast("map<string,string>").alias("extra"),
            F.lit(False).alias("set_tokens"), F.lit(False).alias("set_source"),
            F.lit(True).alias("reset"),
            F.lit(None).cast("string").alias("base_key"),
        )

    set_tok = ~masked("tokens")
    set_src = ~masked("source")
    upsert = F.struct(
        F.col("lsn"), F.col("epoch"), F.col("after.doc_id").alias("doc_id"),
        F.lit(False).alias("deleted"),
        F.when(set_tok, F.col("after.tokens")).alias("tokens"),
        F.when(set_tok, F.col("after.n_tok")).alias("n_tok"),
        F.when(set_src, F.col("after.source")).alias("source"),
        F.coalesce(F.col("after.extra"), F.expr(_EMPTY_MAP)).alias("extra"),
        set_tok.alias("set_tokens"), set_src.alias("set_source"),
        # an INSERT restarts the row image; a PK-change's I-half restarts
        # it FROM the old key's image
        ((F.col("op_type") == "I") | pk_changed).alias("reset"),
        F.when(pk_changed, F.col("before.doc_id")).alias("base_key"),
    )
    events = (
        F.when(F.col("op_type") == "D", F.array(delete_evt(F.col("before.doc_id"))))
        .when(pk_changed, F.array(delete_evt(F.col("before.doc_id")), upsert))
        .otherwise(F.array(upsert))
    )
    kept = [F.col(c) for c in keep]
    return dml.select(*kept, F.explode(events).alias("e")).select(*keep, "e.*")


class _Marker:
    """Chain value still rooted in pre-epoch state (of `origin`)."""

    __slots__ = ("origin",)

    def __init__(self, origin):
        self.origin = origin


def _winner_of(ch: dict, drops: list[tuple[int, str]]) -> dict:
    """Final winner row for a replayed chain (shared by both kernels)."""
    last = ch["last"]
    if last["deleted"]:
        return {
            "lsn": last["lsn"], "epoch": last["epoch"], "doc_id": last["doc_id"],
            "deleted": True, "tokens": None, "n_tok": None, "source": None,
            "extra": {}, "need_tokens": False, "need_source": False,
            "need_extra": False, "state_key": None,
        }
    tv, sv = ch["tokens"], ch["source"]
    need_t = isinstance(tv, _Marker)
    need_s = isinstance(sv, _Marker)
    return {
        "lsn": last["lsn"], "epoch": last["epoch"], "doc_id": last["doc_id"],
        "deleted": False,
        "tokens": None if need_t else tv,
        "n_tok": None if need_t else ch["n_tok"],
        "source": None if need_s else sv,
        "extra": _folded(ch["fold"], drops),
        "need_tokens": need_t, "need_source": need_s,
        "need_extra": ch["origin"] is not None,
        "state_key": ch["origin"],
    }


def _folded(fold: dict, drops: list[tuple[int, str]], at_lsn: int | None = None) -> dict:
    """fold {key: (set_lsn, val)} → {key: val} with drop-DDL purges
    applied (a drop kills values set before it; bounded-list scan —
    DDL volume is tiny)."""
    if not drops:
        return {k: v for k, (_l, v) in fold.items()}
    out = {}
    for k, (l, v) in fold.items():
        if not any(sk == k and l < dl and (at_lsn is None or dl <= at_lsn)
                   for dl, sk in drops):
            out[k] = v
    return out


def _new_chain(key: str) -> dict:
    m = _Marker(key)
    return {"tokens": m, "n_tok": m, "source": m, "fold": {}, "origin": key,
            "last": None}


def _chain_apply(ch: dict, ev: dict) -> None:
    """Advance a chain by one event (one oracle-equivalent transition
    per event, O(1) each)."""
    ch["last"] = ev
    if ev["deleted"]:
        ch["tokens"] = ch["n_tok"] = ch["source"] = None
        ch["fold"] = {}
        ch["origin"] = None
        return
    if ev["reset"]:
        origin = ev["base_key"]
        ch["origin"] = origin
        ch["fold"] = {k: (ev["lsn"], v) for k, v in (ev["extra"] or {}).items()}
        if ev["set_tokens"]:
            ch["tokens"], ch["n_tok"] = ev["tokens"], ev["n_tok"]
        else:
            ch["tokens"] = ch["n_tok"] = _Marker(origin)
        ch["source"] = ev["source"] if ev["set_source"] else _Marker(origin)
        return
    if ev["set_tokens"]:
        ch["tokens"], ch["n_tok"] = ev["tokens"], ev["n_tok"]
    if ev["set_source"]:
        ch["source"] = ev["source"]
    for k, v in (ev["extra"] or {}).items():
        ch["fold"][k] = (ev["lsn"], v)


_ANSWER_SCHEMA = T.StructType(
    [
        T.StructField("pending_lsn", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("tokens_is_marker", T.BooleanType()),
        T.StructField("source", T.StringType()),
        T.StructField("source_is_marker", T.BooleanType()),
        T.StructField("origin", T.StringType()),
        T.StructField("fold", T.MapType(T.StringType(), T.StringType())),
    ]
)

_MAX_CHAIN_ROUNDS = 8

class _Unknown:
    """Pickle-stable singleton sentinel. A bare ``object()`` loses
    identity when a kernel closure and the module functions it calls
    are pickled to executors separately — ``is _UNK`` then silently
    fails across the function boundary. ``__reduce__`` funnels every
    unpickle through the singleton, so identity holds per-process."""

    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __reduce__(self):
        return (_Unknown, ())


#: sentinel: chain component whose value depends on a not-yet-resolved
#: cross-key pending (resolved in a later round)
_UNK = _Unknown()


def _apply_stream_ev(ch: dict, ev: dict, subs: dict) -> None:
    """Advance a chain by one timeline row (kind 0 event or kind 1
    pending placeholder, the latter substituted by its resolved literal
    twin once `subs` holds one)."""
    if int(ev["kind"]) == 1:
        lit = subs.get(ev["lsn"])
        if lit is not None:
            _chain_apply(ch, lit)
            return
        # unresolved pending placeholder: its OWN supplied fields are
        # known; everything it inherits from its (unresolved) base is
        # UNKNOWN until a later setter/barrier overrides
        ch["last"] = ev
        ch["origin"] = _UNK
        ch["fold"] = _UNK
        if ev["set_tokens"]:
            ch["tokens"], ch["n_tok"] = ev["tokens"], ev["n_tok"]
        else:
            ch["tokens"] = ch["n_tok"] = _UNK
        ch["source"] = ev["source"] if ev["set_source"] else _UNK
        return
    # normal event — but an UNKNOWN fold must absorb updates without
    # forgetting it is unknown-based
    if not ev["deleted"] and not ev["reset"] and ch["fold"] is _UNK:
        if ev["set_tokens"]:
            ch["tokens"], ch["n_tok"] = ev["tokens"], ev["n_tok"]
        if ev["set_source"]:
            ch["source"] = ev["source"]
        ch["last"] = ev
        return  # fold/origin stay UNKNOWN
    _chain_apply(ch, ev)


def _snapshot_answer(ch: dict, q: dict, drops: list[tuple[int, str]]):
    """Chain snapshot answering query `q` (strictly-before its lsn), or
    None while the snapshot still depends on an unresolved pending."""
    need_t = not q["set_tokens"]
    need_s = not q["set_source"]
    if (
        (need_t and ch["tokens"] is _UNK)
        or (need_s and ch["source"] is _UNK)
        or ch["origin"] is _UNK
        or ch["fold"] is _UNK
    ):
        return None
    tv, sv = ch["tokens"], ch["source"]
    t_marker = isinstance(tv, _Marker)
    s_marker = isinstance(sv, _Marker)
    return {
        "tokens": None if (t_marker or tv is _UNK) else tv,
        "n_tok": None if (t_marker or tv is _UNK) else ch["n_tok"],
        "tokens_is_marker": t_marker,
        "source": None if (s_marker or sv is _UNK) else sv,
        "source_is_marker": s_marker,
        "origin": ch["origin"],
        "fold": _folded(ch["fold"], drops, at_lsn=q["lsn"]),
    }


def _fold_one_key(
    evs: list[dict], qs: list[dict], want: set, subs: dict,
    drops: list[tuple[int, str]],
) -> list[tuple[dict, dict]]:
    """One linear replay of a key's timeline answering the still-wanted
    queries at their lsns (query strictly-before same-lsn events — the
    D-half of a PK-change sorts after the query, matching the oracle's
    fetch-then-delete order). Returns the (query, answer) pairs that
    resolved."""
    out = []
    ch = None
    i = 0
    for q in qs:
        if q["lsn"] not in want:
            continue
        if ch is None:
            ch = _new_chain(q["doc_id"])
        while i < len(evs) and evs[i]["lsn"] < q["lsn"]:
            _apply_stream_ev(ch, evs[i], subs)
            i += 1
        a = _snapshot_answer(ch, q, drops)
        if a is not None:
            out.append((q, a))
    return out


def _chain_resolve_kernel(drops: list[tuple[int, str]]):
    """Partition kernel resolving ENTIRE cross-key chains locally.

    Input rows carry `kind`: 0 = normal event, 1 = PLACEHOLDER for a
    pending (in its own key's timeline), 2 = QUERY (keyed by the
    pending's base_key; `_orig` holds the pending's own doc_id). Every
    key of a chain component is co-partitioned (resolve_cross_key's
    union-find routing), so resolution iterates HERE: answer what round
    0 can, substitute each resolved pending's literal twin into its own
    key's timeline, refold just the keys that gained a substitution,
    repeat. Each local round resolves ≥1 pending or the feed is cyclic
    (fails loudly — a task error surfaces the message). Output = the
    resolved literal twin events (FETCH_EVENT_SCHEMA) — nothing ever
    returns to the driver."""
    import pandas as pd

    def run_partition(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        if pdf.empty:
            return
        cols = list(pdf.columns)
        timelines: dict[str, list[dict]] = {}
        queries: dict[str, list[dict]] = {}
        for tup in pdf.itertuples(index=False):
            ev = dict(zip(cols, tup))
            if ev["tokens"] is not None:
                ev["tokens"] = list(ev["tokens"])
            if ev["extra"] is not None and not isinstance(ev["extra"], dict):
                ev["extra"] = dict(ev["extra"])
            for b in ("deleted", "reset", "set_tokens", "set_source"):
                ev[b] = bool(ev[b])
            if int(ev["kind"]) == 2:
                queries.setdefault(ev["doc_id"], []).append(ev)
            else:
                timelines.setdefault(ev["doc_id"], []).append(ev)
        for evs in timelines.values():
            evs.sort(key=lambda e: e["lsn"])
        for qs in queries.values():
            qs.sort(key=lambda e: e["lsn"])
        # want[key] = lsns of this key's still-unanswered queries
        want = {k: {q["lsn"] for q in qs} for k, qs in queries.items()}
        subs: dict[int, dict] = {}
        out_rows: list[dict] = []
        n_left = sum(len(s) for s in want.values())
        todo = set(queries)
        while n_left:
            progress = False
            next_todo: set[str] = set()
            for key in sorted(todo):
                w = want.get(key)
                if not w:
                    continue
                for q, a in _fold_one_key(
                    timelines.get(key, []), queries[key], w, subs, drops
                ):
                    lit = _make_resolved(q, a)
                    lit["doc_id"] = q["_orig"]
                    subs[q["lsn"]] = lit
                    w.discard(q["lsn"])
                    n_left -= 1
                    progress = True
                    out_rows.append({n: lit[n] for n in _NAMES})
                    # the resolved pending's own timeline just gained a
                    # substitution — queries targeting it can now refold
                    if want.get(lit["doc_id"]):
                        next_todo.add(lit["doc_id"])
            if n_left and not progress:
                raise RuntimeError(
                    "cross-key fetch chains did not progress (cyclic or "
                    "malformed feed)"
                )
            todo = next_todo
        if out_rows:
            yield pd.DataFrame(out_rows, columns=_NAMES)

    return run_partition


def _answers_expr(stream: DataFrame, drops: list[tuple[int, str]]) -> DataFrame:
    """Round-based JVM query-fold (the impl="expr" legacy twin): one
    Catalyst aggregate per key replays the (event ∪ placeholder ∪
    query)-interleaved timeline and accumulates answer rows, instead of
    a Python fold. Input = FETCH_EVENT_SCHEMA + `kind` int column; output =
    _ANSWER_SCHEMA rows. Query rows sort before same-lsn events via the
    struct's second field (the same _qord trick as the kernel), which
    keeps the fetch-then-delete order of a PK-change's D-half."""
    empty_fold = F.expr("cast(map() as map<string,struct<l:bigint,v:string>>)")
    empty_sfold = F.expr(_EMPTY_MAP)
    drops_arr = _drops_lit(drops)

    ev_struct = F.struct(
        F.col("lsn"),
        F.when(F.col("kind") == 2, F.lit(0)).otherwise(F.lit(1)).alias("qord"),
        F.col("kind"), F.col("epoch"), F.col("deleted"), F.col("tokens"),
        F.col("n_tok"), F.col("source"),
        F.coalesce(F.col("extra"), F.expr(_EMPTY_MAP)).alias("extra"),
        F.col("set_tokens"), F.col("set_source"), F.col("reset"),
        F.col("base_key"),
    )
    grouped = stream.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(ev_struct),
            lambda l, r: F.when(l["lsn"] < r["lsn"], -1)
            .when(l["lsn"] > r["lsn"], 1)
            .when(l["qord"] < r["qord"], -1)
            .when(l["qord"] > r["qord"], 1)
            .otherwise(0),
        ).alias("evs")
    )

    answer_t = (
        "struct<pending_lsn:bigint,ok:boolean,tokens:array<int>,n_tok:int,"
        "tokens_is_marker:boolean,source:string,source_is_marker:boolean,"
        "origin:string,fold:map<string,string>>"
    )
    init = F.struct(
        F.lit(None).cast("array<int>").alias("tokens"),
        F.lit(None).cast("int").alias("n_tok"),
        F.lit(None).cast("string").alias("source"),
        F.lit(True).alias("t_mark"), F.lit(True).alias("s_mark"),
        F.lit(False).alias("t_unk"), F.lit(False).alias("s_unk"),
        empty_fold.alias("fold"), F.lit(False).alias("fold_unk"),
        F.col("doc_id").alias("origin"), F.lit(False).alias("origin_unk"),
        F.expr(f"cast(array() as array<{answer_t}>)").alias("answers"),
    )

    def merge(acc, e):
        # --- kind 2: append a snapshot answer, state unchanged --------
        need_t, need_s = ~e["set_tokens"], ~e["set_source"]
        unk = (
            (need_t & acc["t_unk"]) | (need_s & acc["s_unk"])
            | acc["origin_unk"] | acc["fold_unk"]
        )
        purged = F.map_filter(
            acc["fold"],
            lambda fk, sv: ~F.exists(
                drops_arr,
                lambda d: (d["k"] == fk) & (sv["l"] < d["l"]) & (d["l"] <= e["lsn"]),
            ),
        )
        bad = F.struct(
            e["lsn"].alias("pending_lsn"), F.lit(False).alias("ok"),
            F.lit(None).cast("array<int>").alias("tokens"),
            F.lit(None).cast("int").alias("n_tok"),
            F.lit(False).alias("tokens_is_marker"),
            F.lit(None).cast("string").alias("source"),
            F.lit(False).alias("source_is_marker"),
            F.lit(None).cast("string").alias("origin"),
            empty_sfold.alias("fold"),
        )
        good = F.struct(
            e["lsn"].alias("pending_lsn"), F.lit(True).alias("ok"),
            F.when(~acc["t_mark"] & ~acc["t_unk"], acc["tokens"]).alias("tokens"),
            F.when(~acc["t_mark"] & ~acc["t_unk"], acc["n_tok"]).alias("n_tok"),
            acc["t_mark"].alias("tokens_is_marker"),
            F.when(~acc["s_mark"] & ~acc["s_unk"], acc["source"]).alias("source"),
            acc["s_mark"].alias("source_is_marker"),
            acc["origin"].alias("origin"),
            F.transform_values(purged, lambda _k, sv: sv["v"]).alias("fold"),
        )
        answered = F.struct(
            *[acc[f].alias(f) for f in (
                "tokens", "n_tok", "source", "t_mark", "s_mark", "t_unk",
                "s_unk", "fold", "fold_unk", "origin", "origin_unk",
            )],
            F.array_append(acc["answers"], F.when(unk, bad).otherwise(good))
            .alias("answers"),
        )

        # --- kind 1: unresolved-pending placeholder -------------------
        placeholder = F.struct(
            F.when(e["set_tokens"], e["tokens"]).alias("tokens"),
            F.when(e["set_tokens"], e["n_tok"]).alias("n_tok"),
            F.when(e["set_source"], e["source"]).alias("source"),
            F.lit(False).alias("t_mark"), F.lit(False).alias("s_mark"),
            (~e["set_tokens"]).alias("t_unk"), (~e["set_source"]).alias("s_unk"),
            empty_fold.alias("fold"), F.lit(True).alias("fold_unk"),
            F.lit(None).cast("string").alias("origin"),
            F.lit(True).alias("origin_unk"),
            acc["answers"].alias("answers"),
        )

        # --- kind 0 transitions (mirror fetch_winners_expr + unk) -----
        stamped = F.transform_values(
            e["extra"],
            lambda _k, v: F.struct(e["lsn"].alias("l"), v.alias("v")),
        )
        false_unks = [
            F.lit(False).alias("t_unk"), F.lit(False).alias("s_unk"),
        ]
        del_state = F.struct(
            F.lit(None).cast("array<int>").alias("tokens"),
            F.lit(None).cast("int").alias("n_tok"),
            F.lit(None).cast("string").alias("source"),
            F.lit(False).alias("t_mark"), F.lit(False).alias("s_mark"),
            *false_unks,
            empty_fold.alias("fold"), F.lit(False).alias("fold_unk"),
            F.lit(None).cast("string").alias("origin"),
            F.lit(False).alias("origin_unk"),
            acc["answers"].alias("answers"),
        )
        reset_state = F.struct(
            F.when(e["set_tokens"], e["tokens"]).alias("tokens"),
            F.when(e["set_tokens"], e["n_tok"]).alias("n_tok"),
            F.when(e["set_source"], e["source"]).alias("source"),
            (~e["set_tokens"]).alias("t_mark"), (~e["set_source"]).alias("s_mark"),
            *false_unks,
            stamped.alias("fold"), F.lit(False).alias("fold_unk"),
            e["base_key"].alias("origin"), F.lit(False).alias("origin_unk"),
            acc["answers"].alias("answers"),
        )
        setters_only = F.struct(
            F.when(e["set_tokens"], e["tokens"]).otherwise(acc["tokens"]).alias("tokens"),
            F.when(e["set_tokens"], e["n_tok"]).otherwise(acc["n_tok"]).alias("n_tok"),
            F.when(e["set_source"], e["source"]).otherwise(acc["source"]).alias("source"),
            (acc["t_mark"] & ~e["set_tokens"]).alias("t_mark"),
            (acc["s_mark"] & ~e["set_source"]).alias("s_mark"),
            (acc["t_unk"] & ~e["set_tokens"]).alias("t_unk"),
            (acc["s_unk"] & ~e["set_source"]).alias("s_unk"),
            acc["fold"].alias("fold"), acc["fold_unk"].alias("fold_unk"),
            acc["origin"].alias("origin"), acc["origin_unk"].alias("origin_unk"),
            acc["answers"].alias("answers"),
        )
        merged_fold = F.map_concat(
            F.map_filter(
                acc["fold"],
                lambda fk, _v: ~F.map_contains_key(e["extra"], fk),
            ),
            stamped,
        )
        norm_state = F.struct(
            F.when(e["set_tokens"], e["tokens"]).otherwise(acc["tokens"]).alias("tokens"),
            F.when(e["set_tokens"], e["n_tok"]).otherwise(acc["n_tok"]).alias("n_tok"),
            F.when(e["set_source"], e["source"]).otherwise(acc["source"]).alias("source"),
            (acc["t_mark"] & ~e["set_tokens"]).alias("t_mark"),
            (acc["s_mark"] & ~e["set_source"]).alias("s_mark"),
            *false_unks,
            merged_fold.alias("fold"), F.lit(False).alias("fold_unk"),
            acc["origin"].alias("origin"), F.lit(False).alias("origin_unk"),
            acc["answers"].alias("answers"),
        )
        return (
            F.when(e["kind"] == 2, answered)
            .when(e["kind"] == 1, placeholder)
            .when(e["deleted"], del_state)
            .when(e["reset"], reset_state)
            .when(acc["fold_unk"], setters_only)
            .otherwise(norm_state)
        )

    answers = F.aggregate(F.col("evs"), init, merge, lambda acc: acc["answers"])
    return (
        grouped.select(F.explode(answers).alias("a"))
        .select(*[F.col(f"a.{f.name}") for f in _ANSWER_SCHEMA.fields])
    )


def resolve_cross_key(
    spark: SparkSession, events: DataFrame, drops: list[tuple[int, str]],
    impl: str = "pandas", n_pk_change: int | None = None,
) -> DataFrame:
    """Replace cross-key reset events (PK-change I-halves) with
    literal/marker-resolved twins so the per-key replay becomes fully
    key-local.

    SINGLE-PASS DISTRIBUTED (round 4): the only thing ever collected is
    the pending EDGE set — one (doc_id, base_key) string pair per
    PK-change, capped by `_PENDING_MAX`. The driver union-finds those
    edges into chain components (a pending can only depend on another
    pending reachable through the edge graph), broadcasts the
    key→component map, and routes every queried key's timeline, pending
    placeholder, and image query into its component's partition. The
    kernel (`_chain_resolve_kernel`) then iterates WITHIN the partition
    until every chain is resolved — depth-k chains cost k cheap local
    refolds of just the affected keys, not k driver-blocking Spark jobs
    — and emits the resolved literal twins directly, so there is no
    driver collect of answers and no driver-built injection frame at
    all. The round-3 design ran up to `_MAX_CHAIN_ROUNDS` full jobs with
    a driver collect + Arrow re-injection between each; that serial
    driver share was the engine's one sub-0.8 scaling surface
    (BENCH_scaling_fetch_r3.md). Timelines nobody queries cannot affect
    any answer, so the component join also prunes the fold to queried
    keys only. State lookups stay SYMBOLIC (origin markers) and are
    satisfied by fetch_delta's one typed state join.

    `n_pk_change`: the epoch's PK-change event count when the caller's
    stats pass already knows it (lineage_stats pk_change=True). 0 skips
    even the edge-probe job — the common no-PK-change epoch then pays
    nothing here.

    impl="pandas" (default): the single-pass kernel. impl="expr": the
    legacy round loop with the fold as a JVM Catalyst aggregate
    (`_answers_expr`) — an algorithmically independent twin (different
    fold engine AND different resolution strategy), pinned equal by
    tests."""
    if n_pk_change == 0:
        return events
    is_pending = F.col("reset") & F.col("base_key").isNotNull()
    if impl == "expr":
        pend_rows = _collect_pendings(events)
        if not pend_rows:
            return events
        base = events.filter(~is_pending)
        resolved = _resolve_pendings(
            spark, base, {r["lsn"]: r for r in pend_rows}, drops
        )
        inj_df = _events_df(spark, resolved.values(), _NAMES)
        # structural filter: EVERY cross-key reset row was just resolved,
        # so drop that shape wholesale and union the literal twins back in
        return base.unionByName(inj_df)

    edges = (
        events.filter(is_pending)
        .select("doc_id", "base_key")
        .limit(_PENDING_HARD_MAX + 1)
        .collect()
    )
    if not edges:
        return events
    if len(edges) > _PENDING_HARD_MAX:
        raise ValueError(
            f"more than {_PENDING_HARD_MAX} cross-key (PK-change) fetch "
            "events in one epoch; the edge set alone threatens driver "
            "memory — refusing to resolve a pathological feed"
        )
    if len(edges) > _PENDING_MAX:
        _LOG.warning(
            "fetch cross-key resolve degrading: %d PK-change edges in one "
            "epoch (> soft cap %d) — driver union-find and edge collect "
            "scale linearly; resolution stays distributed and correct",
            len(edges), _PENDING_MAX,
        )

    # union-find over the driver-known pending edges → chain components.
    # The dependency is DIRECTED: a pending on key X querying key B
    # needs B's folded timeline, and folding B in turn needs answers for
    # B's OWN pendings — so X–B must co-locate only when X's timeline is
    # itself folded here, i.e. when X is a QUERIED key. Sibling
    # dependents of the same base key need B but not each other; a
    # non-queried dependent's twin is emitted straight from its query
    # row in B's partition (its kind-1 placeholder is dropped by the
    # comp join below, and the kernel never refolds an unqueried key).
    # Unioning every edge undirected would glue all siblings of a hub
    # key into one component — measured on a Zipf-1.2 500k-event epoch:
    # 9,920 edges collapse into one 7,606-key component (one serial
    # kernel task); the chain-edge-restricted union yields 1,520
    # components, largest 213 (only 395 edges have a queried dependent).
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    # only QUERIED keys (base_keys) ever appear in the resolve stream:
    # timelines nobody queries cannot affect any answer
    queried_set = {e["base_key"] for e in edges}
    for e in edges:
        if e["doc_id"] in queried_set:  # true chain edge
            parent[find(e["doc_id"])] = find(e["base_key"])
    queried = sorted(queried_set)
    roots: dict[str, int] = {}
    comp_df = spark.createDataFrame(
        [(k, roots.setdefault(find(k), len(roots))) for k in queried],
        "doc_id string, _comp int",
    )

    base = events.filter(~is_pending)
    pend = events.filter(is_pending)
    kind0 = F.lit(0).cast("int").alias("kind")
    no_orig = F.lit(None).cast("string").alias("_orig")
    stream = (
        base.select(*_NAMES, kind0, no_orig)
        .unionByName(
            pend.select(*_NAMES, F.lit(1).cast("int").alias("kind"), no_orig)
        )
        .unionByName(
            pend.select(
                F.col("base_key").alias("doc_id"),
                *[F.col(n) for n in _NAMES if n != "doc_id"],
                F.lit(2).cast("int").alias("kind"),
                F.col("doc_id").alias("_orig"),
            ).select(*_NAMES, "kind", "_orig")
        )
        # inner broadcast join = queried-key filter + component tag in one
        .join(F.broadcast(comp_df), "doc_id")
    )
    n_parts = max(1, min(
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        -(-len(queried) // _QUERIED_PER_PART),
    ))
    resolved_events = stream.repartition(n_parts, F.col("_comp")).mapInPandas(
        _chain_resolve_kernel(drops), FETCH_EVENT_SCHEMA
    )
    # structural filter: EVERY cross-key reset row resolves in the pass,
    # so drop that shape wholesale and union the literal twins back in
    return base.unionByName(resolved_events)


def _collect_pendings(events: DataFrame) -> list[dict]:
    """Driver-collect the (capped) cross-key pending set as dicts.

    Deliberately STRICTER than the default impl's soft cap: this legacy
    twin collects full pending ROWS (payload arrays and maps, not the
    two-string edges the single-pass resolver collects), so its driver
    memory bound is genuinely lower — a mass re-key epoch above
    `_PENDING_MAX` must run the default impl="pandas" path, which
    degrades gracefully up to `_PENDING_HARD_MAX`."""

    def to_dict(row) -> dict:
        d = dict(zip(_NAMES, row))
        if d["extra"] is not None and not isinstance(d["extra"], dict):
            d["extra"] = dict(d["extra"])
        if d["tokens"] is not None:
            d["tokens"] = list(d["tokens"])
        return d

    pend_rows = [
        to_dict(r)
        for r in events.filter(F.col("reset") & F.col("base_key").isNotNull())
        .select(*_NAMES)
        .limit(_PENDING_MAX + 1)
        .collect()
    ]
    if len(pend_rows) > _PENDING_MAX:
        raise ValueError(
            f"more than {_PENDING_MAX} cross-key (PK-change) fetch events "
            "in one epoch; the expr twin collects full pending rows "
            "driver-side — use the default impl='pandas' resolver, which "
            f"degrades gracefully up to {_PENDING_HARD_MAX} edges"
        )
    return pend_rows


def _make_resolved(p: dict, a: dict) -> dict:
    out = dict(p)
    if not p["set_tokens"]:
        if a["tokens_is_marker"]:
            out["tokens"], out["n_tok"] = None, None
        else:
            out["tokens"], out["n_tok"] = a["tokens"], a["n_tok"]
            out["set_tokens"] = True
    if not p["set_source"]:
        out["source"] = None if a["source_is_marker"] else a["source"]
        out["set_source"] = not a["source_is_marker"]
    fold = dict(a["fold"] or {})
    fold.update(p["extra"] or {})
    out["extra"] = fold
    # the chain has exactly ONE state root (its origin — any field
    # markers carry the same one); None => fully absolute
    out["base_key"] = a["origin"]
    return out


def _resolve_pendings(
    spark: SparkSession,
    base: DataFrame,
    unresolved: dict[int, dict],
    drops: list[tuple[int, str]],
) -> dict[int, dict]:
    """LEGACY round loop resolving the pending set → {lsn: literal event
    dict}, one `_answers_expr` Catalyst-aggregate job + driver collect
    per chain round. Kept ONLY as resolve_cross_key's impl="expr"
    cross-validating twin; the default path is the single-pass
    `_chain_resolve_kernel`."""
    kind0 = F.lit(0).cast("int").alias("kind")
    resolved: dict[int, dict] = {}
    ans_names = [f.name for f in _ANSWER_SCHEMA.fields]

    for _round in range(_MAX_CHAIN_ROUNDS):
        if not unresolved:
            break
        pend_df = _events_df(spark, unresolved.values(), _NAMES)
        inj_df = (
            _events_df(spark, resolved.values(), _NAMES)
            if resolved
            else spark.createDataFrame([], FETCH_EVENT_SCHEMA)
        )
        stream = (
            base.select(*_NAMES, kind0)
            .unionByName(inj_df.select(*_NAMES, kind0))
            .unionByName(
                pend_df.select(*_NAMES, F.lit(1).cast("int").alias("kind"))
            )
            .unionByName(
                pend_df.select(
                    F.col("base_key").alias("doc_id"),
                    *[F.col(n) for n in _NAMES if n not in ("doc_id",)],
                    F.lit(2).cast("int").alias("kind"),
                ).select(*_NAMES, "kind")
            )
        )
        # queried-key round filter: only timelines some pending
        # QUERIES can affect an answer, so each round folds just
        # those (the set is driver-known and capped → broadcast
        # semi-join; it shrinks with the unresolved set, so later
        # rounds touch a handful of keys instead of re-folding the
        # whole epoch)
        queried = spark.createDataFrame(
            sorted({(d["base_key"],) for d in unresolved.values()}),
            "doc_id string",
        )
        stream = stream.join(F.broadcast(queried), "doc_id", "left_semi")
        answers = _answers_expr(stream, drops).collect()
        progressed = False
        for r in answers:
            a = dict(zip(ans_names, r))
            if a["fold"] is not None and not isinstance(a["fold"], dict):
                a["fold"] = dict(a["fold"])
            if a["tokens"] is not None:
                a["tokens"] = list(a["tokens"])
            p = unresolved.get(a["pending_lsn"])
            if p is None or not a["ok"]:
                continue
            resolved[p["lsn"]] = _make_resolved(p, a)
            del unresolved[p["lsn"]]
            progressed = True
        if unresolved and not progressed:
            raise RuntimeError(
                "cross-key fetch chains did not progress (cyclic or "
                "malformed feed)"
            )
    if unresolved:
        raise ValueError(
            f"cross-key fetch chains deeper than {_MAX_CHAIN_ROUNDS} "
            "rounds; refusing a pathological feed"
        )
    return resolved


def fetch_winners(
    events: DataFrame, drops: list[tuple[int, str]],
    n_events: int | None = None,
) -> DataFrame:
    """Hash-partition by doc_id → ONE sequential pass per partition
    (sort by (doc_id, lsn), fold each key's chain, emit one winner row
    per key).

    mapInPandas over whole partitions, not applyInPandas per key: a
    per-key UDF pays pandas-DataFrame construction per GROUP (~ms), which
    at 10^5 keys/epoch dominates the epoch. Here the per-partition cost
    is one concat + one sort + one linear python fold; partition memory
    is bounded by the doc_id hash partitioning.

    `n_events` (the epoch's DML count — fetch mode always runs the
    stats pre-pass, so callers have it for free) sizes the fold
    exchange to the DATA, ceil(n_events/_EVENTS_PER_FOLD_PART)
    partitions, uncapped: a big epoch gets more folds than the session
    default (bounding per-task pandas memory), a small one gets fewer
    Python-worker round trips. AQE cannot do this here — coalescing
    skips user repartitions and a REBALANCE hint may split one key's
    timeline across tasks, which the fold cannot tolerate. Without the
    count, the session shuffle default applies.

    n_events is a SIZING HEURISTIC, not an exact row count: callers pass
    the raw feed's DML count, which over-counts by heartbeats/DDL in the
    multi-table path and under-counts PK-change splits (each explodes to
    two events) plus resolved twins — small constant factors that only
    nudge the partition count, never correctness."""
    import pandas as pd

    def run_partition(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        if pdf.empty:
            return
        pdf = pdf.sort_values(["doc_id", "lsn"], kind="mergesort")
        out_rows = []
        ch = None
        cur_key = None
        cols = list(pdf.columns)
        for tup in pdf.itertuples(index=False):
            ev = dict(zip(cols, tup))
            if ev["tokens"] is not None:
                ev["tokens"] = list(ev["tokens"])
            if ev["extra"] is not None and not isinstance(ev["extra"], dict):
                ev["extra"] = dict(ev["extra"])
            ev["deleted"] = bool(ev["deleted"])
            ev["reset"] = bool(ev["reset"])
            ev["set_tokens"] = bool(ev["set_tokens"])
            ev["set_source"] = bool(ev["set_source"])
            if ev["doc_id"] != cur_key:
                if ch is not None:
                    out_rows.append(_winner_of(ch, drops))
                cur_key = ev["doc_id"]
                ch = _new_chain(cur_key)
            _chain_apply(ch, ev)
        if ch is not None:
            out_rows.append(_winner_of(ch, drops))
        yield pd.DataFrame(out_rows, columns=[f.name for f in WINNER_SCHEMA.fields])

    if n_events:
        n_parts = max(1, -(-n_events // _EVENTS_PER_FOLD_PART))
        part = events.repartition(n_parts, F.col("doc_id"))
    else:
        part = events.repartition(F.col("doc_id"))
    return part.mapInPandas(run_partition, WINNER_SCHEMA)


#: serialized segment transition (fetch_winners_tree kernel A → B): the
#: net effect of one contiguous-lsn slice of one key's timeline applied
#: to an UNKNOWN prior state — field markers become *_mark flags, the
#: extra fold keeps its per-key set-lsn stamps (drop purge happens at
#: winner emission, exactly like the sequential kernel)
_TRANSITION_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        # long, not int: lsns can be byte offsets (WAL positions) far
        # above chunk_width*2^31 — an int32 chunk would wrap negative
        # and compose later lsn ranges BEFORE earlier ones
        T.StructField("chunk", T.LongType()),
        T.StructField("restarted", T.BooleanType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("t_mark", T.BooleanType()),
        T.StructField("source", T.StringType()),
        T.StructField("s_mark", T.BooleanType()),
        T.StructField("fold_v", T.MapType(T.StringType(), T.StringType())),
        T.StructField("fold_l", T.MapType(T.StringType(), T.LongType())),
        T.StructField("origin", T.StringType()),
        T.StructField("last_lsn", T.LongType()),
        T.StructField("last_epoch", T.IntegerType()),
        T.StructField("last_deleted", T.BooleanType()),
    ]
)


def _chain_to_transition(key: str, chunk: int, ch: dict, restarted: bool) -> dict:
    tv, sv = ch["tokens"], ch["source"]
    t_mark = isinstance(tv, _Marker)
    s_mark = isinstance(sv, _Marker)
    last = ch["last"]
    return {
        "doc_id": key, "chunk": chunk, "restarted": restarted,
        "tokens": None if t_mark else tv,
        "n_tok": None if t_mark else ch["n_tok"],
        "t_mark": t_mark,
        "source": None if s_mark else sv,
        "s_mark": s_mark,
        "fold_v": {k: v for k, (_l, v) in ch["fold"].items()},
        "fold_l": {k: l for k, (l, _v) in ch["fold"].items()},
        "origin": ch["origin"],
        "last_lsn": last["lsn"], "last_epoch": last["epoch"],
        "last_deleted": bool(last["deleted"]),
    }


def _compose_transitions(a: dict, b: dict) -> dict:
    """a ∘ b for consecutive segments (a earlier). A restarted b (its
    slice saw a delete or reset) discards a entirely — its unsupplied
    fields root in PRE-EPOCH state of its own origin, never in a."""
    if b["restarted"]:
        return b
    out = dict(b)
    if b["t_mark"]:
        out["tokens"], out["n_tok"], out["t_mark"] = (
            a["tokens"], a["n_tok"], a["t_mark"],
        )
    if b["s_mark"]:
        out["source"], out["s_mark"] = a["source"], a["s_mark"]
    out["fold_v"] = {**a["fold_v"], **b["fold_v"]}
    out["fold_l"] = {**a["fold_l"], **b["fold_l"]}
    out["origin"] = a["origin"]
    out["restarted"] = a["restarted"]
    return out


def _transition_winner(t: dict, drops: list[tuple[int, str]]) -> dict:
    if t["last_deleted"]:
        return {
            "lsn": t["last_lsn"], "epoch": t["last_epoch"],
            "doc_id": t["doc_id"], "deleted": True, "tokens": None,
            "n_tok": None, "source": None, "extra": {},
            "need_tokens": False, "need_source": False,
            "need_extra": False, "state_key": None,
        }
    fold = {k: (t["fold_l"][k], v) for k, v in t["fold_v"].items()}
    return {
        "lsn": t["last_lsn"], "epoch": t["last_epoch"], "doc_id": t["doc_id"],
        "deleted": False,
        "tokens": t["tokens"], "n_tok": t["n_tok"], "source": t["source"],
        "extra": _folded(fold, drops),
        "need_tokens": bool(t["t_mark"]), "need_source": bool(t["s_mark"]),
        "need_extra": t["origin"] is not None,
        "state_key": t["origin"],
    }


def sample_hot_keys(
    events: DataFrame, n_events: int, share: float = 0.02,
    sample_rows: int = 50_000, seed: int = 7,
) -> list[str]:
    """Keys whose estimated timeline share exceeds `share` of the epoch
    (one job over a bounded sample) — the split set for
    fetch_winners_tree. At Zipf-1.2 skew the top key alone holds ~18%
    of events; everything below `share` folds fine in one task.
    Delegates to sample_key_profile so both dispatch paths share ONE
    sampling definition (fraction/threshold/seed)."""
    return sample_key_profile(events, n_events, share=share,
                              sample_rows=sample_rows, seed=seed)[0]


#: fetch_winners_auto dispatch gates (interleaved best-of-3 A/B at 8
#: pinned cores, BENCH.md «tree fold»): below ~250k events the serial
#: fold costs a few seconds at worst and the profile job + extra
#: shuffle eat the win; the tree fold starts winning between a 20%
#: top-key share (wash: 4.25 s seq vs 4.38 s tree at 1M events) and a
#: 38% share (1.34×: 5.21 vs 3.88 s), so dispatch at ≥30%.
_TREE_MIN_EVENTS = 250_000
_TREE_TOP_SHARE = 0.30


def sample_key_profile(
    events: DataFrame, n_events: int, share: float = 0.02,
    sample_rows: int = 50_000, seed: int = 7,
) -> tuple[list[str], float]:
    """(hot keys above `share`, estimated top-key share) from ONE
    bounded-sample job — the dispatch signal for fetch_winners_auto.
    collect_list skips the when()'s nulls, so the single aggregate row
    carries the sampled total, the max timeline, and the hot set."""
    if not n_events:
        return [], 0.0
    frac = min(1.0, sample_rows / float(n_events))
    thr = max(4.0, share * n_events * frac)
    r = (
        events.sample(fraction=frac, seed=seed)
        .groupBy("doc_id").count()
        .agg(
            F.sum("count").alias("n"),
            F.max("count").alias("top"),
            F.collect_list(
                F.when(F.col("count") >= F.lit(thr), F.col("doc_id"))
            ).alias("hot"),
        )
        .collect()[0]
    )
    if not r["n"]:
        return [], 0.0
    return list(r["hot"]), float(r["top"]) / float(r["n"])


def fetch_winners_auto(
    events: DataFrame,
    drops: list[tuple[int, str]],
    n_events: int | None = None,
    min_events: int | None = None,
    top_share: float | None = None,
    profile: tuple[list[str], float] | None = None,
) -> DataFrame:
    """Winner fold with measured dispatch: a sampled key profile
    decides between the sequential per-key kernel (`fetch_winners`) and
    the parallel-prefix tree fold (`fetch_winners_tree`) — the tree
    only wins when one timeline dominates the epoch (crossover data in
    BENCH.md; both kernels are test-pinned row-equal). Small epochs
    skip the profile job outright.

    `profile`: pass `sample_key_profile(...)` of the PRE-resolve frame
    when the caller holds one persisted (or cheaply re-readable) —
    sampling `events` here would recompute the whole resolve lineage
    for one tiny aggregate (measured 6.8 s vs 0.63 s on a 500k-event
    epoch; resolved PK-change twins shift the key shares only second-
    order, same hot set either way). In the pipelined replay the
    profile runs on the prefetch thread, off the commit critical
    path."""
    lo = _TREE_MIN_EVENTS if min_events is None else min_events
    bar = _TREE_TOP_SHARE if top_share is None else top_share
    if not n_events or n_events < lo:
        return fetch_winners(events, drops, n_events=n_events)
    hot, top = profile if profile is not None else sample_key_profile(
        events, n_events
    )
    if hot and top >= bar:
        _LOG.info(
            "winner fold dispatch: tree (top-key share %.2f >= %.2f, "
            "%d hot keys, %d events)", top, bar, len(hot), n_events,
        )
        return fetch_winners_tree(events, drops, n_events=n_events,
                                  hot_keys=hot)
    return fetch_winners(events, drops, n_events=n_events)


def fetch_winners_tree(
    events: DataFrame,
    drops: list[tuple[int, str]],
    n_events: int | None = None,
    hot_keys: list[str] | None = None,
    chunk_width: int | None = None,
) -> DataFrame:
    """Parallel-prefix twin of `fetch_winners` (VERDICT r4 #6): hot
    keys' timelines fold as SEGMENTED partial transitions composed in
    chunk order, breaking the "hottest key serializes one task" bound
    of the sequential kernel.

    `_chain_apply`'s transition family (field-wise set-if-present merge
    + delete/reset restart) is closed under composition: a segment
    folded from a fresh chain IS its net transition, with Markers
    meaning "inherit" — from the previous segment mid-timeline, from
    pre-epoch state at the head (exactly `_winner_of`'s need flags).
    Kernel A folds (key, lsn-chunk) slices into transition rows (hot
    keys only get real chunks; everyone else is chunk 0); kernel B
    re-shuffles the TINY transition set by key and composes. Cost vs
    the sequential kernel: the same event shuffle + one extra
    O(keys + hot×chunks) shuffle + the sampling job that finds the hot
    set — only worth paying when one timeline dominates the epoch.
    Row-equality with `fetch_winners` is test-pinned;
    `fetch_winners_auto` dispatches here when a sampled key profile
    shows a dominant timeline (measured crossover in BENCH.md: wash at
    a 20% top-key share, 1.34–1.63× wins at 38–60%)."""
    import pandas as pd

    if n_events:
        n_parts = max(1, -(-n_events // _EVENTS_PER_FOLD_PART))
    else:
        n_parts = int(events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if hot_keys is None:
        hot_keys = sample_hot_keys(events, n_events or 0)
    if chunk_width is None:
        chunk_width = max(4096, (n_events or 0) // (4 * n_parts) or 4096)
    if hot_keys:
        chunk_col = (
            F.when(
                F.col("doc_id").isin(list(hot_keys)),
                F.floor(F.col("lsn") / F.lit(int(chunk_width))),
            ).otherwise(F.lit(0)).cast("long")
        )
    else:
        chunk_col = F.lit(0).cast("long")
    staged = events.select(*_NAMES, chunk_col.alias("chunk"))

    def fold_segments(batches):
        pdfs = [p for p in batches if not p.empty]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        pdf = pdf.sort_values(["doc_id", "chunk", "lsn"], kind="mergesort")
        out = []
        ch = None
        cur = None
        restarted = False
        cols = list(pdf.columns)
        for tup in pdf.itertuples(index=False):
            ev = dict(zip(cols, tup))
            if ev["tokens"] is not None:
                ev["tokens"] = list(ev["tokens"])
            if ev["extra"] is not None and not isinstance(ev["extra"], dict):
                ev["extra"] = dict(ev["extra"])
            for b in ("deleted", "reset", "set_tokens", "set_source"):
                ev[b] = bool(ev[b])
            k = (ev["doc_id"], ev["chunk"])
            if k != cur:
                if ch is not None:
                    out.append(_chain_to_transition(cur[0], cur[1], ch, restarted))
                cur = k
                ch = _new_chain(ev["doc_id"])
                restarted = False
            if ev["deleted"] or ev["reset"]:
                restarted = True
            _chain_apply(ch, ev)
        if ch is not None:
            out.append(_chain_to_transition(cur[0], cur[1], ch, restarted))
        yield pd.DataFrame(out, columns=[f.name for f in _TRANSITION_SCHEMA.fields])

    transitions = staged.repartition(
        n_parts, F.col("doc_id"), F.col("chunk")
    ).mapInPandas(fold_segments, _TRANSITION_SCHEMA)

    def compose_partition(batches):
        pdfs = [p for p in batches if not p.empty]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        pdf = pdf.sort_values(["doc_id", "chunk"], kind="mergesort")
        out = []
        acc = None
        cols = list(pdf.columns)
        for tup in pdf.itertuples(index=False):
            t = dict(zip(cols, tup))
            if t["tokens"] is not None:
                t["tokens"] = list(t["tokens"])
            for m in ("fold_v", "fold_l"):
                if t[m] is not None and not isinstance(t[m], dict):
                    t[m] = dict(t[m])
            for b in ("restarted", "t_mark", "s_mark", "last_deleted"):
                t[b] = bool(t[b])
            if acc is not None and acc["doc_id"] == t["doc_id"]:
                acc = _compose_transitions(acc, t)
            else:
                if acc is not None:
                    out.append(_transition_winner(acc, drops))
                acc = t
        if acc is not None:
            out.append(_transition_winner(acc, drops))
        yield pd.DataFrame(out, columns=[f.name for f in WINNER_SCHEMA.fields])

    # transitions are one row per (key, chunk) — tiny; the compose
    # exchange sizes to keys, not events
    comp_parts = max(1, min(n_parts, 64))
    return transitions.repartition(comp_parts, F.col("doc_id")).mapInPandas(
        compose_partition, WINNER_SCHEMA
    )


def _drops_lit(drops: list[tuple[int, str]]):
    """drops → literal array<struct<l,k>> column for in-expression purge."""
    if not drops:
        return F.expr("cast(array() as array<struct<l:bigint,k:string>>)")
    return F.array(*[
        F.struct(F.lit(int(dl)).cast("bigint").alias("l"),
                 F.lit(sk).alias("k"))
        for dl, sk in drops
    ])


def fetch_winners_expr(events: DataFrame, drops: list[tuple[int, str]]) -> DataFrame:
    """JVM twin of `fetch_winners`: per-key chain replay as ONE Catalyst
    aggregate — groupBy(doc_id) → sort_array(collect_list(event)) →
    F.aggregate fold — instead of a Python fold over Arrow batches.

    Same single exchange as the pandas kernel (the groupBy shuffle), but
    the per-event transition runs as interpreted JVM expressions: no
    Python workers, no Arrow round-trip, no per-partition pandas
    concat/sort. The fold state mirrors `_chain_apply` field-for-field
    (tokens/n_tok/source + marker flags, the (set_lsn, value) extra
    fold, the chain origin); `finish` mirrors `_winner_of` including the
    drop-DDL purge. Equality with the pandas kernel is test-pinned.

    lsn is unique within a key's timeline (the PK-change explode puts
    its D- and I-halves on different keys), so ordering by lsn alone is
    total; the sort is an array_sort comparator because structs holding
    a map column are not natively orderable."""
    empty_fold = F.expr("cast(map() as map<string,struct<l:bigint,v:string>>)")
    drops_arr = _drops_lit(drops)

    ev_struct = F.struct(
        F.col("lsn"), F.col("epoch"), F.col("deleted"), F.col("tokens"),
        F.col("n_tok"), F.col("source"),
        F.coalesce(F.col("extra"), F.expr(_EMPTY_MAP)).alias("extra"),
        F.col("set_tokens"), F.col("set_source"), F.col("reset"),
        F.col("base_key"),
    )
    grouped = events.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(ev_struct),
            lambda l, r: F.when(l["lsn"] < r["lsn"], -1)
            .when(l["lsn"] > r["lsn"], 1)
            .otherwise(0),
        ).alias("evs")
    )

    init = F.struct(
        F.lit(None).cast("array<int>").alias("tokens"),
        F.lit(None).cast("int").alias("n_tok"),
        F.lit(None).cast("string").alias("source"),
        F.lit(True).alias("t_mark"), F.lit(True).alias("s_mark"),
        empty_fold.alias("fold"),
        F.col("doc_id").alias("origin"),
        F.lit(None).cast("bigint").alias("lsn"),
        F.lit(None).cast("int").alias("epoch"),
        F.lit(False).alias("deleted"),
    )

    def merge(acc, e):
        stamped = F.transform_values(
            e["extra"],
            lambda _k, v: F.struct(e["lsn"].alias("l"), v.alias("v")),
        )
        del_state = F.struct(
            F.lit(None).cast("array<int>").alias("tokens"),
            F.lit(None).cast("int").alias("n_tok"),
            F.lit(None).cast("string").alias("source"),
            F.lit(False).alias("t_mark"), F.lit(False).alias("s_mark"),
            empty_fold.alias("fold"),
            F.lit(None).cast("string").alias("origin"),
            e["lsn"].alias("lsn"), e["epoch"].alias("epoch"),
            F.lit(True).alias("deleted"),
        )
        reset_state = F.struct(
            F.when(e["set_tokens"], e["tokens"]).alias("tokens"),
            F.when(e["set_tokens"], e["n_tok"]).alias("n_tok"),
            F.when(e["set_source"], e["source"]).alias("source"),
            (~e["set_tokens"]).alias("t_mark"),
            (~e["set_source"]).alias("s_mark"),
            stamped.alias("fold"),
            e["base_key"].alias("origin"),
            e["lsn"].alias("lsn"), e["epoch"].alias("epoch"),
            F.lit(False).alias("deleted"),
        )
        merged_fold = F.map_concat(
            F.map_filter(
                acc["fold"],
                lambda fk, _v: ~F.map_contains_key(e["extra"], fk),
            ),
            stamped,
        )
        norm_state = F.struct(
            F.when(e["set_tokens"], e["tokens"]).otherwise(acc["tokens"]).alias("tokens"),
            F.when(e["set_tokens"], e["n_tok"]).otherwise(acc["n_tok"]).alias("n_tok"),
            F.when(e["set_source"], e["source"]).otherwise(acc["source"]).alias("source"),
            (acc["t_mark"] & ~e["set_tokens"]).alias("t_mark"),
            (acc["s_mark"] & ~e["set_source"]).alias("s_mark"),
            merged_fold.alias("fold"),
            acc["origin"].alias("origin"),
            e["lsn"].alias("lsn"), e["epoch"].alias("epoch"),
            F.lit(False).alias("deleted"),
        )
        return (
            F.when(e["deleted"], del_state)
            .when(e["reset"], reset_state)
            .otherwise(norm_state)
        )

    def finish(acc):
        purged = F.map_filter(
            acc["fold"],
            lambda fk, sv: ~F.exists(
                drops_arr, lambda d: (d["k"] == fk) & (sv["l"] < d["l"])
            ),
        )
        extra_out = F.transform_values(purged, lambda _k, sv: sv["v"])
        tomb = F.struct(
            acc["lsn"].alias("lsn"), acc["epoch"].alias("epoch"),
            F.lit(True).alias("deleted"),
            F.lit(None).cast("array<int>").alias("tokens"),
            F.lit(None).cast("int").alias("n_tok"),
            F.lit(None).cast("string").alias("source"),
            F.expr(_EMPTY_MAP).alias("extra"),
            F.lit(False).alias("need_tokens"),
            F.lit(False).alias("need_source"),
            F.lit(False).alias("need_extra"),
            F.lit(None).cast("string").alias("state_key"),
        )
        alive = F.struct(
            acc["lsn"].alias("lsn"), acc["epoch"].alias("epoch"),
            F.lit(False).alias("deleted"),
            F.when(~acc["t_mark"], acc["tokens"]).alias("tokens"),
            F.when(~acc["t_mark"], acc["n_tok"]).alias("n_tok"),
            F.when(~acc["s_mark"], acc["source"]).alias("source"),
            extra_out.alias("extra"),
            acc["t_mark"].alias("need_tokens"),
            acc["s_mark"].alias("need_source"),
            acc["origin"].isNotNull().alias("need_extra"),
            acc["origin"].alias("state_key"),
        )
        return F.when(acc["deleted"], tomb).otherwise(alive)

    win = F.aggregate(F.col("evs"), init, merge, finish)
    # explode(array(w)) puts a Generate barrier between the interpreted
    # HOF and the per-field projection — CollapseProject would otherwise
    # inline the whole fold once per selected column
    return (
        grouped.select(F.col("doc_id"), F.explode(F.array(win)).alias("w"))
        .select(
            F.col("w.lsn"), F.col("w.epoch"), F.col("doc_id"),
            F.col("w.deleted"), F.col("w.tokens"), F.col("w.n_tok"),
            F.col("w.source"), F.col("w.extra"), F.col("w.need_tokens"),
            F.col("w.need_source"), F.col("w.need_extra"),
            F.col("w.state_key"),
        )
    )


def fetch_delta(
    spark: SparkSession,
    winners: DataFrame,
    state: DataFrame,
    registry: list[dict],
    n_needy: int | None = None,
    needy_bound: int | None = None,
) -> DataFrame:
    """Winners + pre-epoch resolved state → phys delta rows.

    The state side is filtered through a broadcast semi-join of the
    needy keys and then broadcast-LEFT-joined onto the winners: the big
    table streams with zero exchanges (the scale property the
    reference's per-batch CT base join also has); all merging is typed
    (no string round-trips through the extra map). Epochs whose needy
    set exceeds the broadcast caps degrade incrementally: past
    `_IMAGE_BROADCAST_CAP` the image join shuffles O(needy) state rows
    (semi still prunes the scan); past `_SEMI_BROADCAST_CAP` the semi
    shuffles too. The winners side is persisted by the caller, so the
    guard count is a cached scan.

    The guard count job is SKIPPED whenever a cheaper bound already
    decides the join strategy (per-epoch blocking jobs are the fetch
    path's scaling limiter — BENCH_scaling_fetch_uniform_r4.md):
    `n_needy` passes an exact count a prefetch already paid for;
    `needy_bound` passes any upper bound on the needy-key count (the
    epoch's DML count works: needy keys ⊆ winner keys ⊆ DML events) —
    a bound under `_IMAGE_BROADCAST_CAP` proves both broadcasts safe
    without counting anything."""
    reg = norm_registry(registry)
    needy = (
        winners.filter(F.col("need_tokens") | F.col("need_source") | F.col("need_extra"))
        .select(F.col("state_key").alias("doc_id"))
        .distinct()
    )
    if n_needy is None:
        if needy_bound is not None and needy_bound <= _IMAGE_BROADCAST_CAP:
            n_needy = needy_bound
        else:
            n_needy = needy.count()
    bc_semi = F.broadcast if n_needy <= _SEMI_BROADCAST_CAP else (lambda x: x)
    bc_img = F.broadcast if n_needy <= _IMAGE_BROADCAST_CAP else (lambda x: x)
    ssub = state.join(bc_semi(needy), "doc_id", "left_semi").select(
        F.col("doc_id").alias("_sk"),
        F.col("tokens").alias("_s_tokens"),
        F.col("n_tok").alias("_s_n_tok"),
        F.col("source").alias("_s_source"),
        *[F.col(c["target"]).alias(f"_s_{c['phys']}") for c in reg],
    )
    j = winners.join(bc_img(ssub), winners["state_key"] == ssub["_sk"], "left")
    sel = [
        F.col("doc_id"),
        F.when(F.col("need_tokens"), F.col("_s_tokens")).otherwise(F.col("tokens")).alias("tokens"),
        F.when(F.col("need_tokens"), F.col("_s_n_tok")).otherwise(F.col("n_tok")).alias("n_tok"),
        F.when(F.col("need_source"), F.col("_s_source")).otherwise(F.col("source")).alias("source"),
    ]
    for c in reg:
        v_f = F.col("extra").getItem(c["source_key"]).cast(SPARK_TYPE[c["type"]])
        add_lsn = c.get("add_lsn", -1)
        if add_lsn > 0:
            v_f = F.when(F.col("lsn") > F.lit(add_lsn), v_f)
        merged = F.when(
            F.col("need_extra"), F.coalesce(v_f, F.col(f"_s_{c['phys']}"))
        ).otherwise(v_f)
        sel.append(merged.alias(c["phys"]))
    sel += [F.col("lsn").alias("last_lsn"), F.col("deleted")]
    return j.select(*sel)


def build_fetch_delta(
    spark: SparkSession,
    table,
    batch: DataFrame,
    drops: list[tuple[int, str]],
    n_pk_change: int | None = None,
    n_events: int | None = None,
) -> DataFrame:
    """Full fetch pipeline for one epoch: normalize → cross-key resolve
    → per-key replay → typed state join. Returns phys delta rows ready
    for commit_delta (hash-partitioned by doc_id via the replay's
    groupBy exchange). The persisted winners (used by both the needy-key
    probe and the main join) are registered with caching.track_persist;
    the caller releases them after the delta write action."""
    # persisted: the pendings probe, the closure join, and the winners
    # pass would otherwise each recompute the normalize explode over the
    # raw batch (cache is epoch-scoped, released with the winners)
    events = track_persist(normalize_fetch(batch))
    return fetch_delta_from_events(
        spark, table, events, drops, n_pk_change=n_pk_change,
        n_events=n_events,
    )


def fetch_delta_from_events(
    spark: SparkSession,
    table,
    events: DataFrame,
    drops: list[tuple[int, str]],
    winners_impl: str = "pandas",
    n_pk_change: int | None = None,
    n_events: int | None = None,
) -> DataFrame:
    """resolve → per-key replay → typed state join, over ALREADY
    normalized fetch events (FETCH_EVENT_SCHEMA). The multi-table router
    enters here: one staging job normalizes the whole epoch partitioned
    by table, and each table's slice (a cheap parquet re-read, which is
    why the slice needs no persist) flows through this per-table tail
    against that table's own resolved state.

    winners_impl: "pandas" (default) = the Arrow-batched Python kernel;
    "expr" = the same fold as a JVM Catalyst aggregate
    (`fetch_winners_expr`) — measured slower on the 500k bench epoch
    (3.3s vs 2.4s: interpreted HOF eval copies the whole fold
    state per event where the kernel mutates dicts in place); kept as a
    cross-validating twin, pinned equal by tests.

    A FUSED variant (round-0 answers emitted from the winners fold,
    pendings' keys re-folded after resolution) was built and measured
    a wash — interleaved best-of-3 on 500k-event epochs: 8.77 s
    unfused vs 8.86 s fused at the default mix, 10.51 vs 10.74 s at
    8% PK-change (40k pendings, near the cap). The queried-key round
    filter already minimizes the round-0 fold; the fused pass's
    tainted-key patch fold and larger persisted frame offset the saved
    fold, so the simpler unfused pipeline stays."""
    # profile the PRE-resolve frame (persisted by build_fetch_delta;
    # a pruned parquet slice re-read in the multi-table tail) — see
    # fetch_winners_auto's docstring for the measured why
    profile = (
        sample_key_profile(events, n_events)
        if n_events and n_events >= _TREE_MIN_EVENTS else None
    )
    events = resolve_cross_key(spark, events, drops, n_pk_change=n_pk_change)
    if winners_impl == "expr":
        winners = track_persist(fetch_winners_expr(events, drops))
    else:
        winners = track_persist(fetch_winners_auto(
            events, drops, n_events=n_events, profile=profile,
        ))
    state = table.read_resolved(spark)
    return fetch_delta(spark, winners, state, table.state()["registry"],
                       needy_bound=n_events)


def prepare_fetch_epoch(
    spark: SparkSession,
    batch: DataFrame,
    drops: list[tuple[int, str]],
    n_pk_change: int | None = None,
    n_events: int | None = None,
) -> dict:
    """Commit-independent half of the fetch pipeline: normalize →
    cross-key resolve → per-key replay, MATERIALIZED (the winners cache
    is computed by the exact needy-key count, which fetch_delta then
    reuses instead of re-counting).

    Nothing here reads the target table — winners depend only on the
    epoch's own events (state lookups stay symbolic `state_key`
    markers) — so a driver thread can run this for epoch N+1 while
    epoch N's state join, delta write, journal commit, and compaction
    tick are still in flight: the per-epoch blocking jobs that cap the
    fetch path's N→4N scaling (BENCH_scaling_fetch_uniform_r4.md)
    overlap instead of serializing. Callers own the returned persisted
    frames (`persisted`) and must unpersist them after the epoch's
    write action; caching.track_persist is deliberately NOT used — its
    global release would let epoch N's cleanup drop epoch N+1's
    in-flight prefetch caches."""
    events = normalize_fetch(batch).persist()
    winners = None
    try:
        profile = (
            sample_key_profile(events, n_events)
            if n_events and n_events >= _TREE_MIN_EVENTS else None
        )
        resolved = resolve_cross_key(spark, events, drops,
                                     n_pk_change=n_pk_change)
        winners = fetch_winners_auto(
            resolved, drops, n_events=n_events, profile=profile,
        ).persist()
        n_needy = (
            winners.filter(
                F.col("need_tokens") | F.col("need_source") | F.col("need_extra")
            )
            .select("state_key").distinct().count()
        )
    except BaseException:
        # a raise between persist() and return would pin the caches for
        # the session's lifetime (callers only release what we return)
        for df in (events, winners):
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass
        raise
    return {
        "winners": winners,
        "n_needy": n_needy,
        "persisted": [events, winners],
    }
