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
2. Cross-key chains — a PK-change whose update is masked copies fields
   from the OLD key's image: rare (p_pk_change × p_missing), resolved
   exactly on the driver from a bounded broadcast-collected slice of
   the epoch (transitive closure over chained PK-changes), then
   re-injected as literal events. Zero extra state reads.
3. `fetch_winners` — per-key sequential replay as Arrow-batched
   `applyInPandas` over groupBy(doc_id): ONE shuffle, the same exchange
   the LWW dedupe pays in carry mode. Emits each key's winning image
   plus need-from-state flags. (Per-key order is a sequential fold, so
   hot keys cannot salt here — the trade a key-only feed forces.)
4. `fetch_delta` — winners needing pre-epoch state LEFT-join the
   resolved table filtered through a broadcast semi-join of the needy
   keys: the 100-TB table streams, never shuffles, exactly like the
   reference's per-batch base-table join. Typed column merge (no
   string round-trips), then the standard delta commit.

Caps: cross-key pendings and their closure slice are driver-collected
and bounded (`_PENDING_MAX`, `_CLOSURE_MAX`) — PK-change chains are a
tiny fraction of real feeds and a feed exceeding the caps fails loudly
rather than OOMing the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_spark.caching import track_persist
from cdc_spark.sinks.target import norm_registry
from cdc_spark.schema import SPARK_TYPE

_PENDING_MAX = 50_000
_CLOSURE_MAX = 500_000

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


def normalize_fetch(changes: DataFrame) -> DataFrame:
    """CHANGE_SCHEMA rows (key-only wire) → setter-flagged fetch events.

    set_tokens/set_source mark fields the event SUPPLIES; reset marks a
    row-image restart (I, or the I-half of a PK-change split, whose
    image base is the OLD key — base_key)."""
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
    return dml.select(F.explode(events).alias("e")).select("e.*")


class _Marker:
    """Chain value still rooted in pre-epoch state (of `origin`)."""

    __slots__ = ("origin",)

    def __init__(self, origin):
        self.origin = origin


def _replay_rows(key: str, rows: list[dict], drops: list[tuple[int, str]]):
    """Sequential replay of `key`'s in-epoch fetch-events (the oracle's
    fold, shared by the driver-side cross-key resolver and the Arrow
    per-key kernel).

    The chain starts ROOTED IN THE KEY'S PRE-EPOCH STATE (markers) —
    including for an empty `rows` list: an image query against a key
    with no earlier in-epoch events must defer to stored state, not
    report an explicit null. D and I/reset events re-root or clear the
    chain. Returns the final image: tokens/n_tok/source each
    literal-or-_Marker, fold {src_key: (set_lsn, val)}, origin (state
    base key or None), and the winning event."""
    marker = _Marker(key)
    tokens: object = marker
    n_tok: object = marker
    source: object = marker
    fold: dict = {}
    origin: str | None = key
    last = None
    for ev in rows:
        last = ev
        if ev["deleted"]:
            tokens, n_tok, source, fold, origin = None, None, None, {}, None
            continue
        if ev["reset"]:
            origin = ev["base_key"]  # None → absolute (I); else old-key state
            fold = {k: (ev["lsn"], v) for k, v in (ev["extra"] or {}).items()}
            if ev["set_tokens"]:
                tokens, n_tok = ev["tokens"], ev["n_tok"]
            else:
                tokens = n_tok = _Marker(origin)
            source = ev["source"] if ev["set_source"] else _Marker(origin)
            continue
        if ev["set_tokens"]:
            tokens, n_tok = ev["tokens"], ev["n_tok"]
        if ev["set_source"]:
            source = ev["source"]
        for k, v in (ev["extra"] or {}).items():
            fold[k] = (ev["lsn"], v)
    for dlsn, skey in drops:
        if skey in fold and fold[skey][0] < dlsn:
            del fold[skey]
    return {
        "tokens": tokens, "n_tok": n_tok, "source": source,
        "fold": fold, "origin": origin,
        "last": last,
    }


def resolve_cross_key(
    spark: SparkSession, events: DataFrame, drops: list[tuple[int, str]]
) -> DataFrame:
    """Replace cross-key reset events (PK-change I-halves) with
    literal/marker-resolved twins so the per-key replay becomes fully
    key-local.

    Driver-exact: collects the (rare, capped) pendings plus the epoch
    events of every key transitively reachable through base_key links,
    resolves each pending against its base key's in-epoch timeline
    (state lookups stay SYMBOLIC — origin markers — and are satisfied
    by fetch_delta's one typed state join)."""
    pend_rows = (
        events.filter(F.col("reset") & F.col("base_key").isNotNull())
        .limit(_PENDING_MAX + 1)
        .collect()
    )
    if not pend_rows:
        return events
    if len(pend_rows) > _PENDING_MAX:
        raise ValueError(
            f"more than {_PENDING_MAX} cross-key (PK-change) fetch events "
            "in one epoch; refusing to resolve a pathological feed "
            "driver-side"
        )
    by_key: dict[str, list[dict]] = {}
    have: set[str] = set()
    want = {r["base_key"] for r in pend_rows}
    n_collected = 0
    while want - have:
        need = sorted(want - have)
        sub = events.filter(F.col("doc_id").isin(need)).collect()
        n_collected += len(sub)
        if n_collected > _CLOSURE_MAX:
            raise ValueError(
                f"cross-key fetch closure exceeds {_CLOSURE_MAX} events; "
                "refusing to resolve a pathological feed driver-side"
            )
        have |= set(need)
        for r in sub:
            d = r.asDict(recursive=True)
            by_key.setdefault(d["doc_id"], []).append(d)
            if d["reset"] and d["base_key"] is not None:
                want.add(d["base_key"])
    for rows in by_key.values():
        rows.sort(key=lambda d: d["lsn"])

    memo: dict[tuple[str, int], dict] = {}

    def image_at(key: str, lsn: int) -> dict:
        """Image of `key` strictly before `lsn` (chained pendings in the
        timeline resolve recursively; lsn strictly decreases along a
        chain, so recursion terminates)."""
        mk = (key, lsn)
        if mk in memo:
            return memo[mk]
        rows = [_inject(r) for r in by_key.get(key, []) if r["lsn"] < lsn]
        img = _replay_rows(key, rows, [d for d in drops if d[0] <= lsn])
        memo[mk] = img
        return img

    def _inject(r: dict) -> dict:
        if not (r["reset"] and r["base_key"] is not None):
            return r
        return _resolve_one(r)

    resolved: dict[int, dict] = {}

    def _resolve_one(r: dict) -> dict:
        if r["lsn"] in resolved:
            return resolved[r["lsn"]]
        img = image_at(r["base_key"], r["lsn"])
        out = dict(r)
        if not r["set_tokens"]:
            tv = img["tokens"]
            if isinstance(tv, _Marker):
                out["base_key"], out["tokens"], out["n_tok"] = tv.origin, None, None
            else:
                out["tokens"], out["n_tok"] = tv, img["n_tok"]
                out["set_tokens"] = True
        if not r["set_source"]:
            sv = img["source"]
            if isinstance(sv, _Marker):
                out["base_key"] = sv.origin
                out["source"] = None
            else:
                out["source"] = sv
                out["set_source"] = True
        # fold ∪ own extra (own wins); the chain has exactly ONE state
        # root (img origin — the per-field markers above carry the same
        # one), so the injected event's base_key is simply that origin
        # (None ⇒ the chain hit an I/D barrier: fully absolute)
        merged = {k: v for k, (_l, v) in img["fold"].items()}
        merged.update(r["extra"] or {})
        out["extra"] = merged
        out["base_key"] = img["origin"]
        resolved[r["lsn"]] = out
        return out

    injected = [_resolve_one(r.asDict(recursive=True)) for r in pend_rows]
    pend_lsns = [r["lsn"] for r in pend_rows]
    inj_df = spark.createDataFrame(
        [tuple(d[f.name] for f in FETCH_EVENT_SCHEMA.fields) for d in injected],
        schema=FETCH_EVENT_SCHEMA,
    )
    return events.filter(~F.col("lsn").isin(pend_lsns) | ~F.col("reset")
                         | F.col("base_key").isNull()).unionByName(inj_df)


def fetch_winners(events: DataFrame, drops: list[tuple[int, str]]) -> DataFrame:
    """groupBy(doc_id) → per-key sequential replay (Arrow batches) →
    one winning image per key + need-from-state flags."""
    import pandas as pd

    def replay_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        rows = pdf.sort_values("lsn").to_dict("records")
        for r in rows:
            if r["extra"] is not None and not isinstance(r["extra"], dict):
                r["extra"] = dict(r["extra"])
            if r["tokens"] is not None:
                r["tokens"] = list(r["tokens"])
        img = _replay_rows(rows[0]["doc_id"], rows, drops)
        last = img["last"]
        if last["deleted"]:
            out = {
                "lsn": last["lsn"], "epoch": last["epoch"], "doc_id": last["doc_id"],
                "deleted": True, "tokens": None, "n_tok": None, "source": None,
                "extra": {}, "need_tokens": False, "need_source": False,
                "need_extra": False, "state_key": None,
            }
        else:
            tv, sv = img["tokens"], img["source"]
            need_t = isinstance(tv, _Marker)
            need_s = isinstance(sv, _Marker)
            out = {
                "lsn": last["lsn"], "epoch": last["epoch"], "doc_id": last["doc_id"],
                "deleted": False,
                "tokens": None if need_t else tv,
                "n_tok": None if need_t else img["n_tok"],
                "source": None if need_s else sv,
                "extra": {k: v for k, (_l, v) in img["fold"].items()},
                "need_tokens": need_t, "need_source": need_s,
                "need_extra": img["origin"] is not None,
                "state_key": img["origin"],
            }
        return pd.DataFrame([out])

    return events.groupBy("doc_id").applyInPandas(replay_group, WINNER_SCHEMA)


def fetch_delta(
    spark: SparkSession,
    winners: DataFrame,
    state: DataFrame,
    registry: list[dict],
) -> DataFrame:
    """Winners + pre-epoch resolved state → phys delta rows.

    The state side is filtered through a broadcast semi-join of the
    needy keys and then broadcast-LEFT-joined onto the winners: the big
    table streams with zero exchanges (the scale property the
    reference's per-batch CT base join also has); all merging is typed
    (no string round-trips through the extra map)."""
    reg = norm_registry(registry)
    needy = (
        winners.filter(F.col("need_tokens") | F.col("need_source") | F.col("need_extra"))
        .select(F.col("state_key").alias("doc_id"))
        .distinct()
    )
    ssub = state.join(F.broadcast(needy), "doc_id", "left_semi").select(
        F.col("doc_id").alias("_sk"),
        F.col("tokens").alias("_s_tokens"),
        F.col("n_tok").alias("_s_n_tok"),
        F.col("source").alias("_s_source"),
        *[F.col(c["target"]).alias(f"_s_{c['phys']}") for c in reg],
    )
    j = winners.join(F.broadcast(ssub), winners["state_key"] == ssub["_sk"], "left")
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
) -> DataFrame:
    """Full fetch pipeline for one epoch: normalize → cross-key resolve
    → per-key replay → typed state join. Returns phys delta rows ready
    for commit_delta (hash-partitioned by doc_id via the replay's
    groupBy exchange). The persisted winners (used by both the needy-key
    probe and the main join) are registered with caching.track_persist;
    the caller releases them after the delta write action."""
    events = normalize_fetch(batch)
    events = resolve_cross_key(spark, events, drops)
    winners = track_persist(fetch_winners(events, drops))
    state = table.read_resolved(spark)
    return fetch_delta(spark, winners, state, table.state()["registry"])
