"""Deterministic corpus sampling for training-data pipelines.

Seeded `df.sample()` is partition-layout-dependent (a repartition or a
different file split changes which rows survive), which makes pipeline
reruns non-reproducible. Training-data curation wants CONTENT-keyed
sampling: a row's fate depends only on its key, so any engine, any
partitioning, any rerun keeps exactly the same rows — and upsampling a
stratum later keeps the previous sample as a strict subset (the
hash-threshold property).

`stratified_sample` keeps a row iff
``pmod(str_hash60(id || ':' || stratum), 1000) < rate_permille(stratum)``
— one codegen-only scan, no shuffle, trivially pushed past column
pruning. The per-stratum rate is itself derived from the stratum name's
hash (or supplied explicitly), so the whole operator is a pure function
of the data. str_hash60 (md5-prefix → bigint) is the engine's
cross-engine-stable hash: Spark `conv(substr(md5(x),1,15),16,10)` ≡
DuckDB `('0x'||substr(md5(x),1,15))::BIGINT`, so the DuckDB oracle
reproduces the sample bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def str_hash60(c: Column) -> Column:
    """60-bit md5-prefix hash (cross-engine stable; see module doc)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def rate_permille(stratum: Column, lo: int = 100, span: int = 800) -> Column:
    """Deterministic per-stratum keep-rate in [lo, lo+span) ‰, derived
    from the stratum name — the stand-in for a curation config; pass an
    explicit mapping via `rates` in stratified_sample for real use."""
    return (F.lit(lo) + F.pmod(str_hash60(stratum), F.lit(span))).cast("int")


def stratified_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    stratum_col: str = "source",
    rates: dict[str, int] | None = None,
    lo: int = 100,
    span: int = 800,
) -> DataFrame:
    """Keep rows whose content hash falls under their stratum's
    per-mille rate. Adds `rate_permille` (the stratum's rate) and keeps
    every input column. `rates` maps stratum → explicit rate (0..1000);
    unlisted strata fall back to the hash-derived rate."""
    s = F.col(stratum_col)
    rate = rate_permille(s, lo, span)
    if rates:
        expr = None
        for k, v in sorted(rates.items()):
            expr = F.when(s == k, F.lit(int(v))) if expr is None else expr.when(s == k, F.lit(int(v)))
        rate = expr.otherwise(rate)
    bucket = F.pmod(
        str_hash60(F.concat(F.col(id_col).cast("string"), F.lit(":"), s)),
        F.lit(1000),
    )
    return df.withColumn("rate_permille", rate).filter(bucket < F.col("rate_permille"))


def sql_stratified_sample(
    table: str = "documents",
    id_col: str = "doc_id",
    stratum_col: str = "source",
    lo: int = 100,
    span: int = 800,
    select: str = "*",
) -> str:
    """DuckDB twin of `stratified_sample` (hash-derived rates form)."""

    def h(expr: str) -> str:
        return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"

    rate = f"CAST({lo} + ({h(stratum_col)} % {span}) AS INT)"
    key = "CAST(" + id_col + " AS VARCHAR) || ':' || " + stratum_col
    bucket = f"({h(key)} % 1000)"
    return f"""
        SELECT {select}, {rate} AS rate_permille
        FROM {table}
        WHERE {bucket} < {rate}
    """
