"""Measure incremental near-dup cluster maintenance vs full recluster.

The P16 scale claim (SURVEY.md §2): a CDC-fed corpus maintains its
near-dup clusters per epoch from the persisted band index + previous
labels at DELTA cost, instead of re-hashing and re-clustering the whole
corpus. This measures both paths on the same corpus/delta split the
contract entry uses (pmod(doc_id,7)=3 → ~1/7 of docs are the delta):

  full       = band_index(corpus) → pairs → dup_clusters        (timed)
  incremental= band_index(delta)  → dup_clusters_incremental    (timed)
               over the UNTIMED persisted state a warehouse already
               has (base band index + prev labels as parquet tables)

Usage: python tools/bench_inc_clusters.py [sf_dir] [runs] [corpus_scale]
`corpus_scale` k replicates the corpus k× (replica texts tagged so each
replica keeps its own near-dup structure — no cross-replica pairs)
while the DELTA stays the replica-0 slice: the knob that shows the
asymptotics (full recluster grows with the corpus; the incremental
epoch tracks the delta).
Prints one JSON line (best-of-N seconds for each path).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    corpus_scale = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    import pyspark.sql.functions as F

    import __spark_entry__ as em
    from cdc_spark.caching import release_persisted
    from cdc_spark.functions.dedup import (
        band_index, dup_clusters, dup_clusters_incremental, pairs_from_index,
    )
    from cdc_spark.session import get_spark

    spark = get_spark()
    d0 = em._docs_with_variants(spark, sf_dir)
    docs = d0
    for k in range(1, corpus_scale):
        docs = docs.unionByName(
            d0.select(
                (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" replica{k}")).alias("text"),
            )
        )
    n_docs = docs.count()
    is_delta = (F.col("doc_id") < 10_000_000) & (
        F.pmod(F.col("doc_id"), F.lit(7)) == F.lit(3)
    )
    base, delta = docs.filter(~is_delta), docs.filter(is_delta)
    n_delta = delta.count()

    work = tempfile.mkdtemp(prefix="inc_clusters_")
    # untimed setup: the warehouse state an incremental epoch starts from
    band_index(base).write.parquet(f"{work}/base_idx")
    base_idx = spark.read.parquet(f"{work}/base_idx")
    dup_clusters(
        base.select("doc_id"), pairs_from_index(base_idx, base_idx)
    ).write.parquet(f"{work}/prev_labels")
    release_persisted()
    prev = spark.read.parquet(f"{work}/prev_labels")

    def _run_full() -> int:
        out = dup_clusters(
            docs.select("doc_id"),
            pairs_from_index(band_index(docs), band_index(docs)),
        ).count()
        release_persisted()
        return out

    def _run_inc() -> int:
        out = dup_clusters_incremental(prev, base_idx, band_index(delta)).count()
        release_persisted()
        return out

    # JIT/scan warmup (untimed, mirrors bench.py's replay warmup)
    _run_inc()

    def best_of(fn):
        best, rows = None, None
        for _ in range(runs):
            t0 = time.monotonic()
            rows = fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 2), rows

    inc_s, inc_rows = best_of(_run_inc)
    full_s, full_rows = best_of(_run_full)
    print(json.dumps({
        "sf_dir": sf_dir, "runs": runs, "corpus_scale": corpus_scale,
        "n_docs": n_docs, "n_delta": n_delta,
        "full_recluster_sec": full_s, "incremental_sec": inc_s,
        "speedup": round(full_s / inc_s, 2),
        "rows_full": full_rows, "rows_incremental": inc_rows,
        "labels_equal_rowcount": full_rows == inc_rows,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
