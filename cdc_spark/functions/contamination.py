"""Benchmark decontamination (n-gram overlap against an eval set).

Before training, a corpus is scrubbed of documents that contain
verbatim passages from evaluation benchmarks — the standard check is
word-k-gram overlap (GPT-3 used 13-grams; k is a parameter here
because the synthetic corpus is short-doc). A training doc is
CONTAMINATED when it shares at least one k-gram with any eval text.

Scale shape (the 100-TB reasoning): the eval side is benchmarks — MBs
against a corpus of TBs — so its distinct k-gram hash set broadcasts
and the corpus streams through a broadcast equi-join map-side: no
corpus-sized shuffle for the probe itself. K-grams cross the join as
60-bit md5-prefix hashes (`str_hash60`, bit-identical in DuckDB), not
strings, so the broadcast table is 8 bytes/gram. The only corpus-sized
shuffles are the two distinct/groupBy aggregations keyed by doc_id,
both map-side combinable. Explode(k-grams) is O(words) rows but purely
map-side before the partial aggregate.

`tests/test_packing.py` pins the plan (BroadcastHashJoin, no
corpus-side sort) and the semantics (planted overlap found, clean docs
silent, sub-k-gram overlap ignored).

No reference counterpart; P-series training-data operator per
SURVEY.md §2.6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_spark.functions.dedup import sql_hash60, str_hash60
from cdc_spark.functions.text import shingles


def _gram_hashes(df: DataFrame, k: int, text_col: str, *cols) -> DataFrame:
    """Distinct k-gram hashes per row of `df` (plus carried `cols`)."""
    return (
        df.select(*cols, F.explode(shingles(F.col(text_col), k)).alias("_s"))
        .select(*cols, str_hash60(F.col("_s")).alias("_h"))
        .distinct()
    )


def contaminated(
    train: DataFrame,
    eval_df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training docs sharing ≥1 word-k-gram with any eval text:
    (id_col, n_hits) where n_hits counts the DISTINCT shared k-grams.
    Docs with zero overlap are absent (the common case — the output is
    the scrub list, not a corpus-sized flag column).

    `eval_df` needs only `text_col`. It is broadcast — callers with a
    corpus-sized eval side should pre-aggregate instead (not the
    decontamination regime).
    """
    tr = _gram_hashes(train, k, text_col, id_col)
    ev = _gram_hashes(eval_df, k, text_col).select("_h").distinct()
    return (
        tr.join(F.broadcast(ev), "_h")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


def sql_contaminated(
    eval_sql: str,
    k: int = 8,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle twin. `eval_sql` is a subquery producing the eval
    texts as a `text` column (same shape the Spark side derives)."""
    words = f"regexp_split_to_array(trim({text_col}), '\\s+')"
    sh = (
        f"list_distinct(list_transform("
        f"generate_series(0, greatest(len({words}) - {k}, 0)), "
        f"i -> array_to_string(({words})[i+1:i+{k}], ' ')))"
    )
    return f"""
        WITH tr AS (
          SELECT DISTINCT {id_col}, {sql_hash60('u.s')} AS h
          FROM (SELECT {id_col}, {sh} AS sh FROM {table}) t0,
               UNNEST(sh) AS u(s)
        ),
        ev AS (
          SELECT DISTINCT {sql_hash60('u.s')} AS h
          FROM (SELECT {sh} AS sh FROM ({eval_sql}) e) t1,
               UNNEST(sh) AS u(s)
        )
        SELECT {id_col}, count(*) AS n_hits
        FROM tr JOIN ev USING (h)
        GROUP BY {id_col}
    """
