"""Near-duplicate detection for the training-data pipeline.

Exact dedup (hash-groupBy) lives inline in __spark_entry__; this module
adds the approximate family: MinHash+LSH, SimHash, and n-gram Jaccard —
all as pure Catalyst column expressions (JVM codegen, no Python in the
hot path), each with an exact ANSI-SQL twin so DuckDB can oracle them.

Scale shape (the 100-TB reasoning, per operator):

- **MinHash+LSH** (`minhash_signatures` → `band_hashes` →
  `minhash_candidate_pairs`): signatures are a narrow O(rows) scan;
  candidate generation is explode(bands) → shuffle by (band, hash) →
  within-bucket self-join. Only same-bucket pairs materialize — the n²
  never exists. Bucket skew (boilerplate docs) is bounded by banding:
  identical docs share all bands but distinct near-dups spread across
  buckets; a degenerate mega-bucket is capped upstream by exact-dedupe
  first (identical texts collapse to one representative).
- **SimHash** (`simhash`): one fingerprint per doc, O(bits·words)
  inside codegen; near-dup lookup is a bit-count Hamming filter
  (cheap JVM intrinsic) — pairs via same banding trick on bit chunks.
- **n-gram Jaccard** (`jaccard_pairs`): blocking key = the minimum
  shingle hash (1-band/1-row MinHash) → equi-join → exact Jaccard via
  array_intersect/array_union on the survivors only.

The shared cross-engine primitive is `str_hash60`: the first 15 hex
chars of md5 as a non-negative bigint — md5 is bit-identical in Spark
and DuckDB, and 60 bits fits signed int64 in both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_spark.caching import track_persist
from cdc_spark.functions.text import shingles, word_array


def str_hash60(c: Column) -> Column:
    """Deterministic 60-bit string hash identical in Spark and DuckDB:
    Spark `conv(substr(md5(s),1,15),16,10)` ≡ DuckDB
    `('0x' || substr(md5(s),1,15))::BIGINT`."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_hash60(expr: str) -> str:
    """The DuckDB twin of str_hash60 for oracle generation."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

#: Mersenne prime 2^31-1: affine minhash families (a·h+b) mod P stay in
#: int64 (a,h < 2^31 → a·h < 2^62) — no overflow in Spark OR DuckDB.
MINHASH_P = 2_147_483_647


def minhash_coeffs(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic affine-family coefficients (a_j, b_j), a_j ≠ 0.
    Fixed arithmetic (not RNG) so the SQL twin regenerates them exactly."""
    return [
        (((2 * j + 1) * 1_000_003 + 7) % MINHASH_P, (j * j * 40_503 + j + 41) % MINHASH_P)
        for j in range(n_hashes)
    ]


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k_shingle: int = 3, n_hashes: int = 16,
) -> DataFrame:
    """MinHash signatures as (id, sig: array<long>), element j = min over
    the doc's distinct word k-shingles of ((a_j·h(s) + b_j) mod P) — the
    classic affine-permutation family over ONE base hash per shingle.

    Plan shape (the 100-TB reasoning): explode(shingles) → one md5 per
    shingle → groupBy(id) with 16 min() aggregates. min() partial-
    aggregates map-side, so the shuffle carries one 16-number row per
    doc per map partition — not the shingle stream. Compare the naive
    form (16 array_min(transform(...md5...)) columns): 16× the hashing
    and zero partial aggregation."""
    sh = shingles(F.col(text_col), k_shingle)
    ex = df.select(F.col(id_col), F.explode(sh).alias("_s")).select(
        F.col(id_col), (str_hash60(F.col("_s")) % F.lit(MINHASH_P)).alias("_h")
    )
    aggs = [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"_m{j}")
        for j, (a, b) in enumerate(minhash_coeffs(n_hashes))
    ]
    return ex.groupBy(id_col).agg(*aggs).select(
        F.col(id_col),
        F.array(*[F.col(f"_m{j}") for j in range(n_hashes)]).alias("sig"),
    )


def band_hashes(sig: Column, n_hashes: int = 16, bands: int = 4) -> Column:
    """LSH banding: split the signature into `bands` rows-per-band
    groups; each band hashes to one bucket key. Docs agreeing on ANY
    band become candidates."""
    rows = n_hashes // bands
    return F.array(*[
        str_hash60(F.concat_ws(",", *[
            F.element_at(sig, b * rows + r + 1).cast("string") for r in range(rows)
        ]))
        for b in range(bands)
    ])


def with_minhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k_shingle: int = 3, n_hashes: int = 16, bands: int = 4,
) -> DataFrame:
    sigs = minhash_signatures(df, text_col, id_col, k_shingle, n_hashes)
    return sigs.withColumn("band", band_hashes(F.col("sig"), n_hashes, bands))


def minhash_candidate_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k_shingle: int = 3, n_hashes: int = 16, bands: int = 4,
) -> DataFrame:
    """Distinct candidate near-dup pairs from LSH banding, scored by the
    signature-estimated Jaccard (fraction of agreeing minhashes).

    Plan: scan → explode(bands) → shuffle by (band_idx, bucket) →
    in-bucket self-join → distinct pairs. No all-pairs product."""
    m = with_minhash(df, text_col, id_col, k_shingle, n_hashes, bands)
    e = track_persist(m.select(
        id_col, "sig", F.posexplode("band").alias("band_idx", "bucket")
    ))  # both self-join sides read this; without it each side
    # re-runs the signature aggregation (md5 over every shingle). The
    # cache is MEMORY_AND_DISK and LRU-evictable; at warehouse scale the
    # equivalent is a materialized signature table written once.
    a, b = e.alias("a"), e.alias("b")
    # shuffle-hash: the build side is the compact (id, sig) stream, and
    # neither side is broadcast (a broadcast would copy every signature
    # to every task)
    pairs = (
        a.join(b.hint("shuffle_hash"), on=["band_idx", "bucket"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        / F.lit(n_hashes)
    )
    return pairs.select("id_a", "id_b", F.round(est, 4).alias("est_jaccard"))


def sql_minhash_pairs(
    k_shingle: int = 3, n_hashes: int = 16, bands: int = 4,
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id",
) -> str:
    """DuckDB twin of minhash_candidate_pairs (oracle generator)."""
    rows = n_hashes // bands
    words = f"regexp_split_to_array(trim({text_col}), '\\s+')"
    sh = (
        f"list_distinct(list_transform(generate_series(0, greatest(len({words}) - {k_shingle}, 0)), "
        f"i -> array_to_string(({words})[i+1:i+{k_shingle}], ' ')))"
    )
    sig_aggs = ", ".join(
        f"min(({a} * h + {b_}) % {MINHASH_P})"
        for a, b_ in minhash_coeffs(n_hashes)
    )
    band_elems = ", ".join(
        sql_hash60(
            " || ',' || ".join(f"CAST(sig[{b * rows + r + 1}] AS VARCHAR)" for r in range(rows))
        )
        for b in range(bands)
    )
    band_idx_values = ", ".join(f"({b})" for b in range(bands))
    return f"""
        WITH ex AS (
          SELECT {id_col}, ({sql_hash60('u.s')} % {MINHASH_P}) AS h
          FROM (SELECT {id_col}, {sh} AS sh FROM {table}) t0, UNNEST(sh) AS u(s)
        ),
        m AS (
          SELECT {id_col}, sig, [{band_elems}] AS bands
          FROM (SELECT {id_col}, [{sig_aggs}] AS sig FROM ex GROUP BY {id_col}) t
        ),
        e AS (
          SELECT {id_col}, sig, b.band_idx, bands[b.band_idx + 1] AS bucket
          FROM m CROSS JOIN (VALUES {band_idx_values}) b(band_idx)
        )
        SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b,
               round(len(list_filter(range(1, {n_hashes} + 1), i -> a.sig[i] = b.sig[i]))
                     / {n_hashes}.0, 4) AS est_jaccard
        FROM e a JOIN e b ON a.band_idx = b.band_idx AND a.bucket = b.bucket
                          AND a.{id_col} < b.{id_col}
    """


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(text: Column, bits: int = 32) -> Column:
    """SimHash fingerprint over word hashes: bit i is set when at least
    half the doc's words have bit i set in their 60-bit hash. One pass
    over the word-hash array per bit, all inside codegen."""
    hashes = F.transform(word_array(text), str_hash60)
    n = F.size(hashes)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        cnt = _count_bit_set(hashes, 1 << i)
        bit = F.when(cnt * 2 >= n, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig + F.shiftleft(bit, i)
    return sig


def _count_bit_set(hashes: Column, mask: int) -> Column:
    m = F.lit(mask)
    return F.size(F.filter(hashes, lambda h: h.bitwiseAND(m) != 0))


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32,
) -> DataFrame:
    """SimHash as (id, simhash) via explode → partial aggregation — the
    at-scale form of `simhash`. The column-expression form re-evaluates
    the word-hash array once per bit (CollapseProject inlines it ×bits,
    and higher-order functions run interpreted, outside codegen); here
    each word is md5-hashed exactly once and the 32 bit-counters are
    map-side-combining sum() aggregates, so the shuffle carries one
    33-number row per doc per map partition. Tests pin the two forms
    equal."""
    ex = df.select(F.col(id_col), F.explode(word_array(F.col(text_col))).alias("_w")).select(
        F.col(id_col), str_hash60(F.col("_w")).alias("_h")
    )
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1))).alias(f"_b{i}")
        for i in range(bits)
    ]
    agged = ex.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(
            F.col(f"_b{i}") * 2 >= F.col("_n"), F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return agged.select(F.col(id_col), sig.alias("simhash"))


def sql_simhash_query(
    bits: int = 32, table: str = "documents",
    text_col: str = "text", id_col: str = "doc_id",
) -> str:
    """DuckDB twin of simhash as a full statement (oracle generator);
    the word-hash list is computed once in a subquery, then summed
    bit-by-bit — same structure as the Spark expression."""
    words = f"regexp_split_to_array(trim({text_col}), '\\s+')"
    h = sql_hash60("u.w")
    bit_aggs = ", ".join(f"sum((h >> {i}) & 1) AS b{i}" for i in range(bits))
    terms = " + ".join(
        f"(CASE WHEN 2 * b{i} >= n THEN {1 << i}::BIGINT ELSE 0::BIGINT END)"
        for i in range(bits)
    )
    return f"""
        SELECT {id_col}, {terms} AS simhash
        FROM (
          SELECT {id_col}, count(*) AS n, {bit_aggs}
          FROM (SELECT {id_col}, {h} AS h
                FROM (SELECT {id_col}, {words} AS ws FROM {table}) t0, UNNEST(ws) AS u(w)) t1
          GROUP BY {id_col}
        ) t2
    """


# ---------------------------------------------------------------------------
# n-gram Jaccard with min-hash blocking
# ---------------------------------------------------------------------------

def jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k_shingle: int = 3, threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs, blocked by minimum shingle
    hash (each doc lands in exactly ONE bucket → equi-join, no n²);
    recall is that of 1-row/1-band MinHash — pairs with Jaccard ≥ t are
    caught with probability ≥ t. Survivors get exact
    |∩|/|∪| on their distinct shingle sets."""
    # Same explode → partial-agg shape as minhash_signatures: one md5 per
    # shingle, and the aggregation is a hard barrier so neither the
    # self-join sides nor inferred isnotnull join-key filters re-evaluate
    # the (interpreted, md5-heavy) shingle expression. Jaccard runs on
    # the shingle-HASH sets — identical value modulo md5 collisions, and
    # the join shuffles compact int64 arrays instead of string arrays.
    sh = shingles(F.col(text_col), k_shingle)
    ex = df.select(F.col(id_col), F.explode(sh).alias("_s")).select(
        F.col(id_col), str_hash60(F.col("_s")).alias("_h")
    )
    blocked = track_persist(ex.groupBy(id_col).agg(
        F.collect_set("_h").alias("hs"), F.min("_h").alias("block")
    ))  # both self-join sides read this (same rationale as
    # minhash_candidate_pairs: without it each side re-hashes every
    # shingle; at warehouse scale this is a materialized blocking table)
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = a.join(b.hint("shuffle_hash"), on="block").filter(
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    jac = (
        F.size(F.array_intersect("a.hs", "b.hs"))
        / F.size(F.array_union("a.hs", "b.hs"))
    )
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def sql_jaccard_pairs(
    k_shingle: int = 3, threshold: float = 0.5,
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id",
) -> str:
    words = f"regexp_split_to_array(trim({text_col}), '\\s+')"
    sh = (
        f"list_distinct(list_transform(generate_series(0, greatest(len({words}) - {k_shingle}, 0)), "
        f"i -> array_to_string(({words})[i+1:i+{k_shingle}], ' ')))"
    )
    return f"""
        WITH ex AS (
          SELECT {id_col}, {sql_hash60('u.s')} AS h
          FROM (SELECT {id_col}, {sh} AS sh FROM {table}) t0, UNNEST(sh) AS u(s)
        ),
        blocked AS (
          SELECT {id_col}, list_distinct(list(h)) AS hs, min(h) AS block
          FROM ex GROUP BY {id_col}
        ),
        pairs AS (
          SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
                 round(len(list_intersect(a.hs, b.hs))
                       / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))::DOUBLE
                       , 4) AS jaccard
          FROM blocked a JOIN blocked b
            ON a.block = b.block AND a.{id_col} < b.{id_col}
        )
        SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= {threshold}
    """


# ---------------------------------------------------------------------------
# rolling-hash document fingerprint
# ---------------------------------------------------------------------------

def rolling_fingerprint(text: Column, mod: int = 1_000_000_007, mult: int = 31) -> Column:
    """Order-sensitive polynomial rolling hash over word hashes
    (h = (h*31 + hash(w)) mod p). Unlike md5-of-text, insensitive to
    whitespace normalization; modular arithmetic keeps every
    intermediate in int64 range in both engines (DuckDB raises on
    bigint overflow, Spark wraps — neither path is ever hit)."""
    hs = F.transform(word_array(text), lambda w: str_hash60(w) % F.lit(mod))
    return F.aggregate(
        hs, F.lit(0).cast("long"),
        lambda acc, x: (acc * mult + x) % F.lit(mod),
    )


def sql_rolling_fingerprint(expr: str, mod: int = 1_000_000_007, mult: int = 31) -> str:
    words = f"regexp_split_to_array(trim({expr}), '\\s+')"
    h = f"({sql_hash60('w')} % {mod})"
    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform({words}, w -> {h})), "
        f"(acc, x) -> (acc * {mult} + x) % {mod})"
    )


def dup_clusters(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 25,
) -> DataFrame:
    """Near-duplicate CLUSTERS from candidate pairs: connected
    components with the minimum member id as each cluster's
    representative — the step that turns pairwise near-dup hits (P2/P4/
    P5 output) into keep/drop decisions (keep the representative, drop
    the rest).

    Min-label propagation: every node starts labelled with itself; each
    round takes the min of its own and its neighbors' labels; converged
    when a round changes nothing. Rounds ≤ graph diameter — near-dup
    graphs are short chains/stars of variants, so a handful. Each round
    is one shuffle (edges ⋈ labels, groupBy node); the convergence probe
    is an O(1)-row count, never a collect of data rows. This is the
    classic iterative-min formulation (cf. the large-star/small-star
    connected-components family) — the shape that survives 100 TB
    because per-round cost is one hash join + one hash aggregate on
    (node), both map-side combinable.

    Each round's labels are localCheckpoint'ed, not merely persisted:
    persist caches the DATA but keeps the logical plan, so an iterative
    chain's plan DEPTH grows per round and analyzer/broadcast-planning
    cost compounds super-linearly (measured: the un-truncated
    incremental path spent 28 s planning a 2.8k-node graph and produced
    52 MB plan strings downstream). Truncating lineage per round keeps
    planning O(1) per round and every consumer of the returned labels
    gets a flat one-scan plan. On a real cluster prefer a reliable
    checkpoint dir for executor-loss tolerance; the shape is identical.
    """
    from cdc_spark.caching import track_persist

    e = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = track_persist(
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(max_iters):
        nb = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nb_label"))
        )
        new = (
            labels.join(nb, labels["node"] == nb["src"], "left")
            .select(
                F.col("node"),
                F.least(F.col("label"), F.coalesce(F.col("nb_label"), F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iters} rounds "
            "(graph diameter exceeds the cap)"
        )
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_rep"))


def band_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k_shingle: int = 3, n_hashes: int = 16, bands: int = 4,
) -> DataFrame:
    """The persistable LSH index of a corpus: one (id, band_idx, bucket)
    row per doc per band. Written once as a parquet table, it is what
    makes near-dup maintenance INCREMENTAL — new docs probe the index
    with an equi-join instead of re-hashing the whole corpus."""
    m = with_minhash(df, text_col, id_col, k_shingle, n_hashes, bands)
    return m.select(id_col, F.posexplode("band").alias("band_idx", "bucket"))


def pairs_from_index(
    left: DataFrame, right: DataFrame, id_col: str = "doc_id",
) -> DataFrame:
    """Distinct candidate pairs between two band indexes (same-bucket,
    same-band). With left == right this is the full within-corpus
    candidate set; with left = a delta index it is the delta-touching
    set only. Directed output (id_a from `left`); callers treating
    edges as undirected need no dedup beyond `distinct`."""
    a, b = left.alias("a"), right.alias("b")
    return (
        a.join(b.hint("shuffle_hash"), on=["band_idx", "bucket"])
        .filter(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


#: above this many distinct prev-corpus endpoints in the delta's
#: candidate set, the remap joins fall back from broadcast to shuffle
_INC_BROADCAST_CAP = 2_000_000


def dup_clusters_incremental(
    prev_labels: DataFrame,
    base_index: DataFrame,
    delta_index: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 25,
) -> DataFrame:
    """Maintain near-dup clusters under an APPEND-ONLY change feed
    without re-clustering the corpus — the incremental twin of
    `dup_clusters`, and the op a CDC-fed training corpus actually runs
    every epoch.

    Inputs: `prev_labels` (doc_id, cluster_rep) over the existing corpus
    C (reps are min member ids, i.e. `dup_clusters` output),
    `base_index` = C's persisted `band_index`, `delta_index` = the new
    docs Δ's band rows. Docs in Δ must be new ids (append-only; a
    changed doc can SPLIT a cluster, which needs decremental
    connectivity — re-cluster the affected components instead).

    Exactness: connectivity over (C×C ∪ Δ-touching pairs) equals full
    reclustering because prev_labels encodes C×C connectivity exactly
    and contracting a component to its representative preserves
    reachability; reps are min member ids, so min-label over the
    contracted graph yields the same representatives the full run
    picks. Pinned by tests and by the driver oracle (the incremental
    contract entry's oracle is the full-corpus recursive-CTE — the
    result must be split-invariant).

    Scale shape: Δ's signatures are the only new hashing (O(|Δ|));
    candidates come from Δ-index ⋈ (base ∪ Δ) index — an equi-join that
    touches only delta-sharing buckets; min-label propagation runs on
    the CONTRACTED graph (Δ ids + touched reps, delta-scale); and the
    big prev_labels table is only read through one broadcast semi-join
    + one broadcast left join (zero exchanges of the corpus — it
    streams twice, shuffles never). A delta touching more than
    `_INC_BROADCAST_CAP` distinct prev docs degrades the remap joins to
    shuffles instead of over-broadcasting."""
    d = track_persist(delta_index)
    cand = track_persist(
        pairs_from_index(d, base_index.unionByName(d), id_col=id_col)
    )
    pl = prev_labels.select(
        F.col(id_col).alias("_n"), F.col("cluster_rep").alias("_r")
    )
    c_ends = cand.select(F.col("id_b").alias("_n")).distinct()
    small_enough = c_ends.count() <= _INC_BROADCAST_CAP
    bc = F.broadcast if small_enough else (lambda x: x)

    # contract prev-corpus endpoints to their component representative
    # (id_a is always a Δ id — never in prev)
    touched = track_persist(pl.join(bc(c_ends), "_n", "left_semi"))
    edges = cand.join(
        bc(touched), cand["id_b"] == touched["_n"], "left"
    ).select("id_a", F.coalesce("_r", "id_b").alias("id_b"))

    nodes = (
        d.select(id_col)
        .unionByName(edges.select(F.col("id_a").alias(id_col)))
        .unionByName(edges.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    small = track_persist(dup_clusters(nodes, edges, id_col=id_col, max_iters=max_iters))

    # relabel: Δ docs take their small-graph label directly; prev docs
    # relabel only if their rep's component merged (broadcast remap —
    # the corpus-sized side never shuffles)
    delta_labels = small.join(bc(d.select(id_col).distinct()), id_col, "left_semi")
    remap = small.join(
        bc(touched.select(F.col("_r").alias(id_col)).distinct()), id_col, "left_semi"
    ).select(F.col(id_col).alias("_rep"), F.col("cluster_rep").alias("_new"))
    carried = prev_labels.join(
        bc(remap), prev_labels["cluster_rep"] == remap["_rep"], "left"
    ).select(
        F.col(id_col),
        F.coalesce("_new", "cluster_rep").alias("cluster_rep"),
    )
    return carried.unionByName(delta_labels)


def sql_dup_clusters(pairs_sql: str, nodes_sql: str, id_col: str = "doc_id") -> str:
    """DuckDB twin of `dup_clusters`: recursive reachability → min
    reachable id per node. `pairs_sql` must yield (id_a, id_b);
    `nodes_sql` must yield the id column."""
    return f"""
        WITH RECURSIVE pairs AS ({pairs_sql}),
        nodes AS ({nodes_sql}),
        edges AS (
            SELECT id_a AS s, id_b AS d FROM pairs
            UNION ALL
            SELECT id_b AS s, id_a AS d FROM pairs
        ),
        reach(node, lab) AS (
            SELECT {id_col}, {id_col} FROM nodes
            UNION
            SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node
        )
        SELECT node AS {id_col}, CAST(min(lab) AS BIGINT) AS cluster_rep
        FROM reach GROUP BY node
    """
