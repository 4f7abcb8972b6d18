"""Physical-plan inspection helpers.

The engine's scale posture lives in plan PROPERTIES, not in code
comments: filters reach the parquet scan, scans read only needed
columns, aggregations partial-reduce map-side, and no redundant
exchanges appear. These helpers extract those properties from
`explain("formatted")` output so tests can PIN them — a plan regression
(e.g. a lost pushdown after a refactor) fails CI instead of silently
costing a full-table scan at 100 TB.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters bracket contents, one string per file scan (filter
    expressions contain commas, so no per-entry splitting)."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings of every file scan (column pruning)."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (excludes broadcast exchanges)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def hash_exchange_widths(df: DataFrame) -> dict[str, list[int]]:
    """{first-key-column: [numPartitions, ...]} for every shuffle
    hashpartitioning Exchange in the plan — pins that an exchange is
    sized to its DATA (ceil(workload/const)) rather than silently
    tracking spark.sql.shuffle.partitions (a cluster-width fan-out of
    tiny Python tasks was round 4's one real perf regression)."""
    out: dict[str, list[int]] = {}
    # formatted mode details an Exchange as "Arguments: hashpartitioning(
    # cols..., N), REPARTITION_BY_NUM"; simple mode inlines it as
    # "Exchange hashpartitioning(...)" — match both
    # keys may themselves contain parens (cast(col as string),
    # pmod(xxhash64(...), 32)) — allow one nesting level in the arg
    # scan and anchor the partition count as the LAST bare integer
    # before the closing paren
    for m in re.finditer(
        r"(?:Exchange |Arguments: )hashpartitioning\("
        r"((?:[^()]|\((?:[^()]|\([^()]*\))*\))*)\)",
        formatted_plan(df),
    ):
        args = m.group(1)
        key = args.split("#")[0].split("(")[-1].strip()
        tail = re.search(r"(\d+)\s*$", args)
        if tail is None:
            continue
        out.setdefault(key, []).append(int(tail.group(1)))
    return out


def has_partial_aggregate(df: DataFrame) -> bool:
    """True when the plan partial-aggregates before the shuffle
    (HashAggregate with a partial mode below an Exchange)."""
    plan = formatted_plan(df)
    return bool(re.search(r"Functions \[\d+\]: \[partial_", plan))


def scan_columns(df: DataFrame) -> set[str]:
    """Union of column names actually read from files."""
    cols: set[str] = set()
    for schema in read_schemas(df):
        cols.update(re.findall(r"(\w+):", schema))
    return cols
