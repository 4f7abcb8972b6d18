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
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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


def _nearest_centroid(vec: Column, centroids: np.ndarray) -> Column:
    """Argmin-distance cluster id as a pure column expression: an array
    of (dist, idx) structs reduced by array_min (lexicographic → min
    dist, ties to lowest idx). JVM-side; no UDF."""
    entries = []
    for i, c in enumerate(centroids):
        cl = F.array(*[F.lit(float(x)) for x in c])
        diff = F.zip_with(vec, cl, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b))
        dist = F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v)
        entries.append(F.struct(dist.alias("dist"), F.lit(i).alias("idx")))
    return F.array_min(F.array(*entries))["idx"]


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
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer → probe only the
    `n_probe` clusters nearest the query → exact cosine rank on those
    candidates. The scan prunes (1 - n_probe/n_clusters) of the table;
    at scale the cluster id is precomputed+partitioned-by at write time
    so probing touches only matching partitions (partition pruning)."""
    sample = np.array(
        [r[vec_col] for r in df.select(vec_col).limit(fit_sample).collect()],
        dtype=np.float64,
    )
    centroids = _kmeans_fit(sample, n_clusters, seed=seed)
    q = np.asarray(query_vec, dtype=np.float64)
    probe = np.argsort(((centroids - q[None, :]) ** 2).sum(axis=1))[:n_probe].tolist()

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
) -> np.ndarray:
    """Materialize the IVF index: vectors written parquet-partitioned by
    their coarse-quantizer cluster (`_cluster=K/` directories) plus the
    centroids as JSON. Probing then reads ONLY the probed clusters'
    partitions — real partition pruning, the on-disk form of the
    `ivf_topk` scan-prune. This is the 100-TB layout: assignment is a
    one-time write-side cost; every query touches n_probe/n_clusters of
    the data."""
    import json
    import os

    sample = np.array(
        [r[vec_col] for r in df.select(vec_col).limit(fit_sample).collect()],
        dtype=np.float64,
    )
    centroids = _kmeans_fit(sample, n_clusters, seed=seed)
    assigned = df.select(
        F.col(id_col), F.col(vec_col),
        _nearest_centroid(F.col(vec_col), centroids).alias("_cluster"),
    )
    assigned.write.mode("overwrite").partitionBy("_cluster").parquet(path)
    with open(os.path.join(path, "_centroids.json"), "w") as f:
        json.dump(centroids.tolist(), f)
    return centroids


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
    exact-rank the candidates."""
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        centroids = np.array(json.load(f))
    q = np.asarray(query_vec, dtype=np.float64)
    probe = np.argsort(((centroids - q[None, :]) ** 2).sum(axis=1))[:n_probe].tolist()
    cand = spark.read.parquet(path).filter(
        F.col("_cluster").isin([int(p) for p in probe])
    )
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
        F.col(id_col), F.col(vec_col), sig.alias("_sig")
    ))  # both self-join sides read this; without it each side
    # recomputes every hyperplane projection (n_planes dot products/row)
    a, b = with_sig.alias("a"), with_sig.alias("b")
    pairs = a.join(b.hint("shuffle_hash"), on="_sig").filter(
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    scored = pairs.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), round_to).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= threshold)
