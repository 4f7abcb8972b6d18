"""Arrow-vectorized (pandas UDF) kernels.

The north star designates the normalize stage as the vectorized-UDF
showcase. The default engine path uses pure Catalyst expressions (faster
— stays in whole-stage codegen); this module provides the equivalent
Arrow-batched kernel, pinned equal by tests/test_normalize.py, and is
the template for kernels that genuinely can't be expressed as column ops
(reference analogue: the row-at-a-time converters in
source/oracle/Normalizer.java:160-217 and common/AvroConverter.java:105-236,
replaced here by one Arrow batch transfer per partition — never per-row
Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_IMG_TYPE = (
    "struct<tokens:array<int>, n_tok:int, source:string, extra:map<string,string>>"
)


@pandas_udf(_IMG_TYPE)
def _merge_images(
    op_type: pd.Series, before: pd.DataFrame, after: pd.DataFrame, mask: pd.Series
) -> pd.DataFrame:
    """Vectorized before/after merge (reference Normalizer.java:177-207).

    Arrow hands structs across as pandas DataFrames; we operate on whole
    columns. The per-element map merge is the only object-level loop and
    runs on dict objects inside one Arrow batch (no Spark row boundary)."""
    is_u = op_type == "U"
    mask_sets = mask.map(lambda m: set(m) if m is not None else set())
    take_before_tok = is_u & mask_sets.map(lambda s: "tokens" in s)
    take_before_src = is_u & mask_sets.map(lambda s: "source" in s)

    tokens = after["tokens"].where(~take_before_tok, before["tokens"])
    n_tok = after["n_tok"].where(~take_before_tok, before["n_tok"])
    source = after["source"].where(~take_before_src, before["source"])

    def merge_extra(pair):
        b, a = pair
        out = {}
        if b is not None:
            out.update(dict(b))
        if a is not None:
            out.update(dict(a))
        return out

    extra = pd.Series(
        map(merge_extra, zip(before["extra"], after["extra"])), index=op_type.index
    )
    return pd.DataFrame(
        {"tokens": tokens, "n_tok": n_tok, "source": source, "extra": extra}
    )


def merged_image_arrow(dml: DataFrame) -> DataFrame:
    """Attach `_img` = merged full image, computed in one Arrow kernel."""
    return dml.withColumn(
        "_img",
        _merge_images(
            F.col("op_type"), F.col("before"), F.col("after"), F.col("missing_mask")
        ),
    )
