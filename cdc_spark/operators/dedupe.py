"""Last-writer-wins dedupe per key (SURVEY.md §2 O3 — the core redesign).

The reference guarantees apply order by funnelling the whole feed through
ONE partition (single Kafka partition, GoldenGate Kafka.java:242-259;
JdbcRDD numPartitions=1 with the TODO "We should partition it for
scalability", CTInputDStream.java:127-130). We keep N input partitions
and restore *per-key* order instead: only the max-lsn event per doc_id
survives a micro-batch; cross-batch order comes from the monotone lsn
kept in the target table (last_lsn).

Three interchangeable strategies (tests pin them equal):

- ``agg`` (default): ``groupBy(key).agg(max_by(struct(*), lsn))``.
  Hash aggregate with map-side partial aggregation — hot keys reduce
  locally before the shuffle, so Zipf skew never concentrates on one
  reducer. This is the 100-TB path.
- ``window``: ``row_number() over (partition by key order by lsn desc)``.
  The textbook formulation (and the DuckDB-oracle formulation), but a
  full shuffle+sort with no partial reduction — skew-sensitive.
- ``salted``: explicit two-phase window — partial LWW within
  (key, salt=pmod(xxhash64(lsn), S)) partitions, then final LWW across
  the ≤S survivors per key (the north rule's salted repartitioning,
  mirroring partial+final aggregation; SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_dedupe(
    df: DataFrame,
    key: str = "doc_id",
    order: str = "lsn",
    mode: str = "agg",
    salt_buckets: int = 16,
) -> DataFrame:
    """Keep only the max-`order` row per `key`. Ties broken by `deleted`
    (delete wins — only possible for the D half of a PK-change split,
    which shares the source event's lsn with its I half but always
    targets a *different* key, so ties cannot occur in valid feeds;
    the tiebreak just makes the operator total)."""
    cols = df.columns
    if mode == "agg":
        ordering = F.struct(F.col(order), F.col("deleted")) if "deleted" in cols else F.col(order)
        return (
            df.groupBy(key)
            .agg(F.max_by(F.struct(*[c for c in cols if c != key]), ordering).alias("_r"))
            .select(key, "_r.*")
            .select(*cols)
        )
    if mode == "window":
        order_cols = [F.col(order).desc()]
        if "deleted" in cols:
            order_cols.append(F.col("deleted").desc())
        w = Window.partitionBy(key).orderBy(*order_cols)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .select(*cols)
        )
    if mode == "salted":
        salt = F.pmod(F.xxhash64(F.col(order)), F.lit(salt_buckets)).alias("_salt")
        salted = df.withColumn("_salt", salt).repartition(F.col(key), F.col("_salt"))
        w1 = Window.partitionBy(key, "_salt").orderBy(F.col(order).desc())
        partial = (
            salted.withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_salt")
        )
        w2 = Window.partitionBy(key).orderBy(F.col(order).desc())
        return (
            partial.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .select(*cols)
        )
    raise ValueError(f"unknown dedupe mode {mode!r}")
