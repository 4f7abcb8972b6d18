"""Exactly-once, schema-evolving target table (SURVEY.md §7.1 M2).

An Iceberg-shaped snapshot table implemented on plain parquet + an atomic
JSON commit journal, because the sandbox has no Iceberg runtime jar. The
engine codes against this class only; on a real cluster the same calls
map 1:1 to Iceberg operations:

| here                          | Iceberg                                   |
|-------------------------------|-------------------------------------------|
| journal file vNNNNNNNN.json   | snapshot + metadata.json (atomic swap)    |
| commit_delta(epoch=E)         | MERGE INTO … with snapshot summary        |
|                               | property cdc.epoch=E (idempotency guard)  |
| merge-on-read resolution      | equality-delete files + MoR scan          |
| compact()                     | rewrite_data_files                        |
| apply_ddl add/rename/widen    | ALTER TABLE ADD/RENAME/ALTER COLUMN       |

The reference has none of this: offsets live in driver memory
(CTInputDStream.java:60-62,96-97 — restart rereads from 0) and sinks are
at-least-once with idempotent row upserts (CDCHBase.java:75-126). We fix
that debt: the journal rename is the single atomic commit point; a
re-delivered epoch is a no-op (has_epoch guard), so replay from any
checkpoint converges to the same state.

Write amplification: each micro-batch appends O(batch) delta bytes (the
merge-on-read choice — a copy-on-write MERGE would rewrite O(table)
bytes per batch, which cannot work at 10^10 events); reads resolve LWW
with one hash aggregate; compaction every `compact_every` commits bounds
read fan-in. Deltas and base are written partitioned-by-bucket of doc_id
so the resolve aggregate shuffles evenly under Zipf keys.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_spark.schema import SPARK_TYPE, WIDENINGS

BASE_FIELDS = [
    ("doc_id", T.StringType()),
    ("tokens", T.ArrayType(T.IntegerType())),
    ("n_tok", T.IntegerType()),
    ("source", T.StringType()),
]


class TargetTable:
    """PK-addressed mutable table of pre-tokenized sequences (F2)."""

    def __init__(self, path: str, compact_every: int = 16, buckets: int = 32):
        self.path = path
        self.journal_dir = os.path.join(path, "_journal")
        self.compact_every = compact_every
        self.buckets = buckets

    # -- journal ------------------------------------------------------------

    def create_if_absent(self) -> None:
        os.makedirs(self.journal_dir, exist_ok=True)
        if not self._versions():
            self._commit(
                {
                    "version": 0,
                    "kind": "create",
                    "registry": [],
                    "base_version": 0,
                    "delta_epochs": [],
                    "applied_ddl": [],
                    # applied epochs = [epoch_floor, epoch_watermark] plus
                    # the sparse `epochs` list; stats kept only for the
                    # sparse tail. Compaction folds the contiguous prefix
                    # into the watermark so journal entries stay O(deltas),
                    # not O(all epochs ever) — at 10^10-event scale the
                    # journal is parsed on every micro-batch. epoch_floor
                    # (min epoch ever applied) bounds the fold from below:
                    # without it a table whose feed starts at epoch N>0
                    # would treat every epoch < N as already-applied and
                    # silently no-op a late delivery of one.
                    "epoch_floor": None,
                    "epoch_watermark": -(10**18),
                    "epochs": [],
                    "epochs_applied": 0,
                    "epoch_stats": {},
                }
            )

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.journal_dir):
            return []
        return sorted(
            int(f[1:9]) for f in os.listdir(self.journal_dir) if f.endswith(".json")
        )

    def state(self) -> dict:
        vs = self._versions()
        if not vs:
            raise FileNotFoundError(f"no table at {self.path}; call create_if_absent")
        with open(os.path.join(self.journal_dir, f"v{vs[-1]:08d}.json")) as f:
            return json.load(f)

    def _commit(self, entry: dict) -> dict:
        """Atomic commit point: write tmp + rename (POSIX atomic)."""
        entry["snapshot_id"] = uuid.uuid4().hex[:16]
        tmp = os.path.join(self.journal_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(entry, f)
            f.flush()
            os.fsync(f.fileno())
        final = os.path.join(self.journal_dir, f"v{entry['version']:08d}.json")
        os.rename(tmp, final)
        return entry

    # -- epoch idempotency (exactly-once) ------------------------------------

    def has_epoch(self, epoch: int, state: dict | None = None) -> bool:
        floor, w, sparse = self.applied_epochs(state)
        return epoch in sparse or (floor is not None and floor <= epoch <= w)

    def applied_epochs(self, state: dict | None = None) -> tuple[int | None, int, set[int]]:
        """(floor, watermark, sparse): applied ⇔ floor <= e <= watermark
        or e in the sparse set.

        Legacy journals (written before epoch_floor existed) carry a
        watermark but no epoch_floor KEY; their semantics were
        "everything <= watermark is applied", so the floor reads as
        -inf — otherwise a resumed legacy table would re-apply every
        compaction-folded epoch (duplicate deltas)."""
        st = state or self.state()
        if "epoch_floor" in st:
            floor = st["epoch_floor"]
        elif st.get("epoch_watermark", -(10**18)) > -(10**18):
            floor = -(10**18)  # legacy journal with a folded watermark
        else:
            floor = None
        return (
            floor,
            st.get("epoch_watermark", -(10**18)),
            set(st["epochs"]),
        )

    def max_epoch(self, state: dict | None = None) -> int | None:
        st = state or self.state()
        _, w, sparse = self.applied_epochs(st)
        if sparse:
            return max(sparse)
        return None if w <= -(10**18) else w

    def epoch_stats(self, epoch: int) -> dict | None:
        """(n_events, min_lsn, max_lsn) recorded when the epoch committed —
        lets a redelivery be told apart from a PARTIAL delivery (an epoch
        split across micro-batches by a file-source trigger limit).
        Returns None for epochs folded below the compaction watermark."""
        return self.state().get("epoch_stats", {}).get(str(epoch))

    def has_ddl(self, ddl_id: str) -> bool:
        return ddl_id in self.state()["applied_ddl"]

    # -- schema -------------------------------------------------------------

    def schema(self, registry: list[dict] | None = None) -> T.StructType:
        """Physical file schema: base cols + registry extras + bookkeeping."""
        reg = self.state()["registry"] if registry is None else registry
        fields = [T.StructField(n, t) for n, t in BASE_FIELDS]
        fields += [T.StructField(c["target"], SPARK_TYPE[c["type"]]) for c in reg]
        fields += [
            T.StructField("last_lsn", T.LongType()),
            T.StructField("deleted", T.BooleanType()),
        ]
        return T.StructType(fields)

    # -- DDL (K2/K3: reference sink/CDCKudu.java:68-126 alter-before-DML) ----

    def apply_ddl(self, spark: SparkSession, kind: str, payload: str, ddl_id: str) -> None:
        """Apply one schema-evolution event transactionally.

        add_column is metadata-only (old files lack the column → nulls via
        parquet schema merge). rename/widen rewrite the base via compaction
        so physical column names/types stay unambiguous — the reference's
        Kudu sink flushes on every schema change too (CDCKudu.java:372-376)
        and its rename-as-drop+add *loses data* (CDCKudu.java:91-102 uses a
        symmetric set diff); ours preserves it — deliberate, test-pinned
        divergence (SURVEY.md §7.3)."""
        st = self.state()
        if ddl_id in st["applied_ddl"]:
            return
        p = json.loads(payload)
        reg = [dict(c) for c in st["registry"]]
        if kind == "add_column":
            if p["type"] not in SPARK_TYPE:
                raise ValueError(f"unsupported column type {p['type']}")
            # add_lsn: only events newer than the add may supply values.
            # Without it, the two-phase DDL-before-DML barrier lets a
            # mid-epoch drop+re-add leak pre-drop values into the
            # re-added column (projection masks on it; pipeline
            # project_to_table) — the set-based equivalent of the
            # reference's strict in-epoch DDL/DML ordering
            # (CTSQLServer.java:108-114).
            try:
                add_lsn = int(ddl_id.rsplit(":", 1)[1])
            except (IndexError, ValueError):
                add_lsn = -1
            reg.append({
                "target": p["name"], "source_key": p["name"], "type": p["type"],
                "add_lsn": add_lsn,
            })
            self._commit(
                {
                    **st,
                    "version": st["version"] + 1,
                    "kind": "ddl",
                    "registry": reg,
                    "applied_ddl": st["applied_ddl"] + [ddl_id],
                }
            )
            return
        if kind == "rename_column":
            hit = [c for c in reg if c["target"] == p["from"]]
            if not hit:
                raise KeyError(f"rename: no column {p['from']}")
            hit[0]["target"] = p["to"]
        elif kind == "widen_column":
            hit = [c for c in reg if c["target"] == p["name"]]
            if not hit:
                raise KeyError(f"widen: no column {p['name']}")
            if (hit[0]["type"], p["to"]) not in WIDENINGS:
                raise ValueError(f"illegal widening {hit[0]['type']}→{p['to']}")
            hit[0]["type"] = p["to"]
        elif kind == "drop_column":
            # data loss by design (reference CDCKudu.java:103-106): the
            # compaction rewrite below omits the column from every file,
            # so a later re-add of the same name starts from nulls
            hit = [c for c in reg if c["target"] == p["name"]]
            if not hit:
                raise KeyError(f"drop: no column {p['name']}")
            reg.remove(hit[0])
            self._compact_to(
                spark, st, reg, extra_ddl=[ddl_id],
                old_names=[c["target"] for c in reg],
            )
            return
        else:
            raise ValueError(f"unknown ddl_kind {kind}")
        # rename/widen rewrite data files under the new registry
        self._compact_to(spark, st, reg, extra_ddl=[ddl_id])

    # -- read (merge-on-read resolution) --------------------------------------

    def _data_paths(self, st: dict) -> list[str]:
        paths = []
        if st["base_version"]:
            paths.append(os.path.join(self.path, "base", f"v{st['base_version']:08d}"))
        paths += [os.path.join(self.path, "delta", f"epoch={e:08d}") for e in st["delta_epochs"]]
        return [p for p in paths if os.path.isdir(p)]

    def read_resolved(self, spark: SparkSession, state: dict | None = None) -> DataFrame:
        """Current table contents: LWW-resolved, tombstones dropped.

        One hash aggregate (max_by over last_lsn) — map-side partial
        aggregation keeps hot doc_ids from skewing the shuffle."""
        st = state or self.state()
        sch = self.schema(st["registry"])
        paths = self._data_paths(st)
        if not paths:
            return spark.createDataFrame([], sch).drop("deleted")
        df = spark.read.option("mergeSchema", "true").parquet(*paths)
        # files written before an add_column lack that column entirely
        for f in sch.fields:
            if f.name not in df.columns:
                df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        df = df.select([F.col(f.name).cast(f.dataType) for f in sch.fields])
        cols = [c for c in df.columns if c != "doc_id"]
        resolved = (
            df.groupBy("doc_id")
            .agg(F.max_by(F.struct(*cols), F.struct("last_lsn", "deleted")).alias("_r"))
            .select("doc_id", "_r.*")
        )
        return resolved.filter(~F.col("deleted")).drop("deleted")

    # -- write ----------------------------------------------------------------

    def _write_bucketed(self, df: DataFrame, outdir: str, pre_partitioned: bool = False) -> None:
        """Repartition by doc_id hash (reference sink-side bucketing,
        CDCKudu.java:226-228) so same-key rows co-locate across files.

        `pre_partitioned=True` skips the exchange when the caller's plan
        already hash-partitions by doc_id (the LWW dedupe aggregate does)
        — one less shuffle per micro-batch."""
        if not pre_partitioned:
            df = df.repartition(self.buckets, F.col("doc_id"))
        df.write.mode("overwrite").parquet(outdir)

    def commit_delta(
        self, df: DataFrame, epoch: int, stats: dict | None = None,
        pre_partitioned: bool = False,
    ) -> dict | None:
        """Append one micro-batch's deduped apply-rows; idempotent per epoch.

        df columns must match self.schema() (lsn already renamed last_lsn).
        `stats` ({n_events, min_lsn, max_lsn} of the raw batch) is stored
        for redelivery-vs-partial-delivery detection; a CALLABLE stats is
        invoked after the data write but before the journal commit — the
        hook for Observation-folded metrics (and their guards): a raise
        there aborts the commit with only an unjournaled, overwrite-safe
        delta dir left behind. Returns the journal entry, or None if the
        epoch was already applied (exactly-once re-delivery guard)."""
        st = self.state()
        if self.has_epoch(epoch, st):
            return None
        outdir = os.path.join(self.path, "delta", f"epoch={epoch:08d}")
        self._write_bucketed(df, outdir, pre_partitioned=pre_partitioned)
        if callable(stats):
            stats = stats()
        entry = self._commit(
            {
                **st,
                "version": st["version"] + 1,
                "kind": "delta",
                "delta_epochs": st["delta_epochs"] + [epoch],
                # resolved via applied_epochs so a legacy journal (no
                # epoch_floor key) keeps its -inf floor instead of
                # un-applying its folded watermark range
                "epoch_floor": (lambda f: epoch if f is None else min(f, epoch))(
                    self.applied_epochs(st)[0]
                ),
                "epochs": sorted(set(st["epochs"]) | {epoch}),
                "epochs_applied": st.get("epochs_applied", 0) + 1,
                "epoch_stats": {**st.get("epoch_stats", {}),
                                **({str(epoch): stats} if stats else {})},
            }
        )
        if len(entry["delta_epochs"]) >= self.compact_every:
            spark = df.sparkSession
            entry = self._compact_to(spark, entry, entry["registry"])
        return entry

    # -- compaction ------------------------------------------------------------

    def _compact_to(
        self,
        spark: SparkSession,
        st: dict,
        new_registry: list[dict],
        extra_ddl: list[str] | None = None,
        old_names: list[str] | None = None,
    ) -> dict:
        """Rewrite base under new_registry; consume all deltas.

        Resolution happens under the OLD registry names, then columns are
        re-projected old-target → new-target. `old_names` (aligned with
        new_registry) names the old column each new column reads from;
        default is positional (registry order is stable across
        rename/widen); a drop passes the surviving names explicitly."""
        old_reg = st["registry"]
        if old_names is None:
            assert len(old_reg) == len(new_registry), "need old_names when dropping"
            old_names = [c["target"] for c in old_reg]
        resolved = self.read_resolved(spark, st)  # old names, tombstones gone
        sel = [F.col(n).alias(n) for n, _ in BASE_FIELDS]
        for old_name, new_c in zip(old_names, new_registry):
            sel.append(F.col(old_name).cast(SPARK_TYPE[new_c["type"]]).alias(new_c["target"]))
        sel.append(F.col("last_lsn"))
        out = resolved.select(*sel).withColumn("deleted", F.lit(False))

        new_base = st["version"] + 1
        outdir = os.path.join(self.path, "base", f"v{new_base:08d}")
        self._write_bucketed(out, outdir)
        # fold the contiguous applied prefix into the watermark so the
        # epochs list + stats stay O(epochs-since-last-gap), not O(all);
        # the fold starts at epoch_floor, never below it (a feed starting
        # at epoch N>0 must not mark epochs < N applied)
        floor = st.get("epoch_floor")
        w = st.get("epoch_watermark", -(10**18))
        if floor is not None and w < floor:
            w = floor - 1
        sparse = sorted(set(st["epochs"]))
        while sparse and sparse[0] <= w + 1:
            w = max(w, sparse.pop(0))
        entry = self._commit(
            {
                **st,
                "version": new_base,
                "kind": "compact",
                "registry": new_registry,
                "base_version": new_base,
                "delta_epochs": [],
                "applied_ddl": st["applied_ddl"] + (extra_ddl or []),
                "epoch_watermark": w,
                "epochs": sparse,
                "epoch_stats": {
                    k: v for k, v in st.get("epoch_stats", {}).items() if int(k) in set(sparse)
                },
            }
        )
        self._gc(entry)
        return entry

    def compact(self, spark: SparkSession) -> dict:
        st = self.state()
        return self._compact_to(spark, st, st["registry"])

    def _gc(self, st: dict) -> None:
        """Drop data dirs no longer reachable from the latest commit."""
        live = {os.path.abspath(p) for p in self._data_paths(st)}
        for sub in ("base", "delta"):
            d = os.path.join(self.path, sub)
            if not os.path.isdir(d):
                continue
            for child in os.listdir(d):
                p = os.path.abspath(os.path.join(d, child))
                if p not in live:
                    shutil.rmtree(p, ignore_errors=True)


class TableRouter:
    """Per-table TargetTables under one root — the multi-table sink.

    The reference discovers and processes every CT-enabled table per
    batch (source/sqlserver/CTInputDStream.java:65-99, per-table schema
    state CTSQLServer.java:154-172). Here each routed table owns its own
    journal/registry/data tree at ``root/tables/<name>/`` — schema
    evolution, exactly-once epochs and compaction are all per-table, so
    a crash between two tables' commits resumes cleanly (the committed
    table no-ops, the other applies)."""

    def __init__(self, root: str, compact_every: int = 16, buckets: int = 32):
        self.root = root
        self.compact_every = compact_every
        self.buckets = buckets
        self._tables: dict[str, TargetTable] = {}

    @staticmethod
    def _safe(name: str) -> str:
        out = "".join(c if (c.isalnum() or c in "._-") else "_" for c in name)
        if not out or out.startswith("."):
            raise ValueError(f"unroutable table name {name!r}")
        if out != name:
            # sanitization can collide ("a/b" vs "a_b") — disambiguate
            # with a stable suffix derived from the original name
            import hashlib

            out += "-" + hashlib.md5(name.encode()).hexdigest()[:8]
        return out

    def get(self, name: str) -> TargetTable:
        """TargetTable for a routed table name (created on first touch —
        the reference's create-if-absent per table, CDCKudu.java:68-126)."""
        t = self._tables.get(name)
        if t is None:
            path = os.path.join(self.root, "tables", self._safe(name))
            t = TargetTable(path, compact_every=self.compact_every, buckets=self.buckets)
            t.create_if_absent()
            marker = os.path.join(path, "_table_name")
            if not os.path.isfile(marker):
                with open(marker, "w") as f:
                    f.write(name)
            self._tables[name] = t
        return t

    def names(self) -> list[str]:
        """Routed (raw) table names present on disk — read from each
        table dir's _table_name marker so sanitized directory names never
        leak into (or double-count against) the raw namespace."""
        d = os.path.join(self.root, "tables")
        found = set()
        for child in os.listdir(d) if os.path.isdir(d) else []:
            marker = os.path.join(d, child, "_table_name")
            if os.path.isfile(marker):
                with open(marker) as f:
                    found.add(f.read())
            else:
                found.add(child)  # pre-marker table dir: name == dir
        return sorted(found | set(self._tables))
