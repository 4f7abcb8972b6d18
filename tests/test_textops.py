"""Unit tests for the near-dup family (functions.dedup) and the
multimodal plumbing (functions.multimodal)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cdc_spark.functions.dedup import (
    jaccard_pairs,
    minhash_candidate_pairs,
    minhash_coeffs,
    minhash_signatures,
    rolling_fingerprint,
    simhash,
    simhash_signatures,
)
from cdc_spark.functions.multimodal import (
    decode_image,
    documents_as_media,
    extract_features,
    frame_sample,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "a quick brown fox jumps over the lazy dog again and again today"
OTHER = "completely different words about databases and distributed query engines"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, OTHER), (4, BASE)], ["doc_id", "text"]
    )


def test_minhash_identical_docs_full_agreement(docs):
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[4]
    assert len(sigs[1]) == 16
    assert sigs[1] != sigs[3]


def test_minhash_candidates_find_near_dups_not_unrelated(docs):
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in minhash_candidate_pairs(docs).collect()}
    assert pairs[(1, 4)] == 1.0  # identical docs agree on every hash
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup caught by some band
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_coeffs_deterministic_nonzero():
    cs = minhash_coeffs(16)
    assert cs == minhash_coeffs(16)
    assert all(a != 0 for a, _ in cs)
    assert len(set(cs)) == 16


def test_simhash_hamming_reflects_similarity(docs, spark):
    out = {r["doc_id"]: r["sh"] for r in docs.select("doc_id", simhash(F.col("text")).alias("sh")).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert out[1] == out[4]
    assert ham(out[1], out[2]) < ham(out[1], out[3])


def test_simhash_agg_form_equals_expression_form(docs):
    expr_form = {r["doc_id"]: r["sh"] for r in docs.select("doc_id", simhash(F.col("text")).alias("sh")).collect()}
    agg_form = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert expr_form == agg_form


def test_jaccard_pairs_exact_values(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_pairs(docs, threshold=0.0).collect()}
    assert pairs[(1, 4)] == 1.0
    assert 0.5 < pairs[(1, 2)] < 1.0
    # unrelated doc shares no min-shingle block -> never compared
    assert not any(3 in p for p in pairs)


def test_rolling_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha  beta   gamma")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["fp"] for r in df.select("doc_id", rolling_fingerprint(F.col("text")).alias("fp")).collect()}
    assert out[1] != out[2]  # order matters
    assert out[1] == out[3]  # whitespace-normalization invariant


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", fake=False)
    assert decode_image(b"x" * 100, fake=True) == {"width": 16 + 36, "height": 16 + 1}


def test_extract_features_shapes(docs):
    media = documents_as_media(docs)
    out = {r["asset_id"]: r for r in extract_features(media, fake=True).collect()}
    assert len(out) == 4
    r = out["1"]
    assert r["n_bytes"] == len(BASE.encode())
    assert r["width"] == 16 + r["n_bytes"] % 64
    assert r["n_frames"] is None  # image has no frames


def test_frame_sample_expansion(docs):
    media = documents_as_media(docs, media_type="video")
    rows = frame_sample(media, every_n=10, fake=True).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r)
    n = len(BASE.encode())
    expect_frames = 1 + n % 240
    got = sorted(r["frame_idx"] for r in by_asset["1"])
    assert got == list(range(0, expect_frames, 10))
    assert all(r["ts_ms"] == r["frame_idx"] * 33 for r in rows)


def test_dup_clusters_transitive_chain(spark):
    """A variant-of-a-variant chain must collapse into ONE cluster with
    the min id as representative (transitivity beyond direct pairs)."""
    from cdc_spark.functions.dedup import dup_clusters

    nodes = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (1, 2), (4, 6)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r["cluster_rep"] for r in
           dup_clusters(nodes, pairs).collect()}
    from cdc_spark.caching import release_persisted

    release_persisted()
    assert out == {0: 0, 3: 0, 5: 0, 1: 1, 2: 1, 4: 4, 6: 4}


def test_stratified_sample_deterministic_and_nested(spark):
    """Content-keyed sampling: identical rows survive across reruns and
    partitionings, and raising a stratum's rate keeps the smaller
    sample as a strict subset."""
    from pyspark.sql import functions as F

    from cdc_spark.functions.sampling import stratified_sample

    d = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
    )
    a = {r["doc_id"] for r in stratified_sample(d).collect()}
    b = {r["doc_id"] for r in stratified_sample(d.repartition(13)).collect()}
    assert a == b and 0 < len(a) < 2000
    low = {r["doc_id"] for r in
           stratified_sample(d, rates={"src1": 100}).filter(F.col("source") == "src1").collect()}
    high = {r["doc_id"] for r in
            stratified_sample(d, rates={"src1": 700}).filter(F.col("source") == "src1").collect()}
    assert low < high  # strict subset: upsampling never drops kept rows


def test_dup_clusters_incremental_hand_built(spark):
    """Hand-crafted band indexes exercise every incremental topology:
    a delta doc BRIDGING two existing clusters (merge via contraction),
    a delta doc joining one cluster where the delta id becomes the new
    min (rep steal), a delta-only pair, and an isolated delta doc —
    result must equal a full re-cluster over the union pair set."""
    from cdc_spark.caching import release_persisted
    from cdc_spark.functions.dedup import (
        dup_clusters, dup_clusters_incremental, pairs_from_index,
    )

    base_idx = spark.createDataFrame(
        [(10, 0, 100), (11, 0, 100),   # cluster {10,11} rep 10
         (20, 0, 200), (21, 0, 200),   # cluster {20,21} rep 20
         (40, 0, 400),                 # singleton
         (50, 0, 500)],                # will be stolen by delta id 5
        "doc_id long, band_idx int, bucket long",
    )
    delta_idx = spark.createDataFrame(
        [(90, 0, 100), (90, 0, 200),   # bridges {10,11} and {20,21}
         (5, 0, 500),                  # joins {50}; 5 < 50 → new rep
         (60, 0, 600), (61, 0, 600),   # delta-only pair
         (70, 0, 700)],                # isolated
        "doc_id long, band_idx int, bucket long",
    )
    base_nodes = base_idx.select("doc_id").distinct()
    prev = dup_clusters(base_nodes, pairs_from_index(base_idx, base_idx))
    inc = {r["doc_id"]: r["cluster_rep"] for r in
           dup_clusters_incremental(prev, base_idx, delta_idx).collect()}

    full_idx = base_idx.unionByName(delta_idx)
    full = {r["doc_id"]: r["cluster_rep"] for r in
            dup_clusters(full_idx.select("doc_id").distinct(),
                         pairs_from_index(full_idx, full_idx)).collect()}
    release_persisted()
    assert inc == full
    assert inc[90] == 10 and inc[21] == 10     # bridged merge, min rep
    assert inc[50] == 5 and inc[5] == 5        # delta id steals rep
    assert inc[60] == 60 and inc[61] == 60
    assert inc[70] == 70 and inc[40] == 40


def test_dup_clusters_incremental_minhash_end_to_end(spark, tmp_path):
    """Real minhash indexes: corpus split into base/delta, incremental
    maintenance must land on exactly the clusters of a full re-run —
    with the base index round-tripped through parquet (the warehouse
    shape: the index is a persisted table, not a recomputation)."""
    from cdc_spark.caching import release_persisted
    from cdc_spark.functions.dedup import (
        band_index, dup_clusters, dup_clusters_incremental, pairs_from_index,
    )
    import pyspark.sql.functions as F

    texts = []
    for i in range(30):
        body = " ".join(f"w{i}x{j}" for j in range(12))
        texts.append((i, body))
        texts.append((i + 1000, body.split(" ", 1)[1]))  # near-dup variant
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    is_delta = F.pmod(F.col("doc_id"), F.lit(7)) == F.lit(3)
    base, delta = docs.filter(~is_delta), docs.filter(is_delta)

    band_index(base).write.parquet(str(tmp_path / "band_index"))
    base_idx = spark.read.parquet(str(tmp_path / "band_index"))
    prev = dup_clusters(base.select("doc_id"),
                        pairs_from_index(base_idx, base_idx))
    inc = {r["doc_id"]: r["cluster_rep"] for r in
           dup_clusters_incremental(prev, base_idx, band_index(delta)).collect()}

    full_idx = band_index(docs)
    full = {r["doc_id"]: r["cluster_rep"] for r in
            dup_clusters(docs.select("doc_id"),
                         pairs_from_index(full_idx, full_idx)).collect()}
    release_persisted()
    assert inc == full
    assert len(inc) == 60


def test_dup_clusters_incremental_fallback_above_cap(spark, monkeypatch):
    """A delta touching more prev docs than the broadcast cap must take
    the shuffle-join fallback and still produce identical clusters."""
    import cdc_spark.functions.dedup as dd
    from cdc_spark.caching import release_persisted

    monkeypatch.setattr(dd, "_INC_BROADCAST_CAP", 0)
    base_idx = spark.createDataFrame(
        [(10, 0, 100), (11, 0, 100), (20, 0, 200), (21, 0, 200)],
        "doc_id long, band_idx int, bucket long",
    )
    delta_idx = spark.createDataFrame(
        [(90, 0, 100), (90, 0, 200), (5, 0, 300)],
        "doc_id long, band_idx int, bucket long",
    )
    prev = dd.dup_clusters(base_idx.select("doc_id").distinct(),
                           dd.pairs_from_index(base_idx, base_idx))
    inc = {r["doc_id"]: r["cluster_rep"] for r in
           dd.dup_clusters_incremental(prev, base_idx, delta_idx).collect()}
    release_persisted()
    assert inc == {10: 10, 11: 10, 20: 10, 21: 10, 90: 10, 5: 5}


def test_dup_clusters_incremental_corpus_never_shuffles(spark):
    """Scale property: the corpus-sized prev_labels table is read only
    through broadcast joins — the final plan may not sort-merge-join,
    and the relabel joins must be broadcast."""
    from cdc_spark.caching import release_persisted
    from cdc_spark.functions.dedup import (
        dup_clusters, dup_clusters_incremental, pairs_from_index,
    )

    base_idx = spark.createDataFrame(
        [(10, 0, 100), (11, 0, 100), (20, 0, 200)],
        "doc_id long, band_idx int, bucket long",
    )
    delta_idx = spark.createDataFrame(
        [(90, 0, 100)], "doc_id long, band_idx int, bucket long",
    )
    prev = dup_clusters(base_idx.select("doc_id").distinct(),
                        pairs_from_index(base_idx, base_idx))
    out = dup_clusters_incremental(prev, base_idx, delta_idx)
    plan = out._jdf.queryExecution().executedPlan().toString()
    release_persisted()

    # The plan string embeds every cached relation's ORIGINAL physical
    # plan (the already-materialized CC iterations — joins on node/src,
    # truncated by the cache at runtime), so a blanket no-SMJ assert
    # can't work. Assert the property that matters: no sort-merge join
    # ever touches the corpus-labels side — every join keyed on the
    # label/relabel columns (doc_id, cluster_rep, _rep, _n) must be
    # broadcast.
    bad = [
        ln for ln in plan.splitlines()
        if "SortMergeJoin" in ln and any(
            k in ln for k in ("doc_id#", "cluster_rep#", "_rep#", "_n#", "_new#")
        )
    ]
    assert not bad, bad
    assert plan.count("BroadcastHashJoin") >= 2


def test_vocab_top_k_counts_and_tiebreak(spark):
    from cdc_spark.functions.text import vocab_top_k

    d = spark.createDataFrame(
        [
            (1, "a b b c"),
            (2, "b c c"),
            (3, "zzz a"),
        ],
        "doc_id long, text string",
    )
    got = [
        (r["token"], r["n_occurrences"], r["n_docs"])
        for r in vocab_top_k(d, k=3).collect()
    ]
    # b and c tie at 3 occurrences -> token asc breaks the tie
    assert got == [("b", 3, 2), ("c", 3, 2), ("a", 2, 2)]


def test_vocab_top_k_plan_partial_aggs_no_global_sort(spark):
    """100-TB pins: both aggregation levels reduce map-side (a corpus
    stopword collapses per partition before the wire) and the top-k is
    TakeOrderedAndProject — no corpus-sized Sort node."""
    from cdc_spark.functions.text import vocab_top_k
    from cdc_spark.plans.inspect import formatted_plan, has_partial_aggregate

    d = spark.createDataFrame(
        [(i, f"w{i % 7} the and w{i % 3}") for i in range(200)],
        "doc_id long, text string",
    )
    q = vocab_top_k(d, k=5)
    assert has_partial_aggregate(q)
    plan = formatted_plan(q)
    assert "TakeOrderedAndProject" in plan
    import re

    assert not re.search(r"\(\d+\) Sort\b", plan)
