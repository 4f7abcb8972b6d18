"""Regenerate cdc_spark/functions/ivf_centroids.py (frozen quantizer).

Deterministic: k-means (seed 42, 8 iters, k=16) on the first 2048
sf0.001 embedding vectors in vec_id order, rounded to 6 decimals.
Run from the repo root: python tools/gen_ivf_centroids.py
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

sys.path.insert(0, ".")

from cdc_spark.functions.similarity import _kmeans_fit  # noqa: E402

SAMPLE_SQL = (
    "SELECT embedding FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet') "
    "ORDER BY vec_id LIMIT 2048"
)

HEADER = '''"""Frozen IVF coarse-quantizer centroids (16 x 64).

Fit ONCE offline (deterministic k-means, seed 42, 8 iters) on the
sf0.001 embeddings sample and frozen as literals, rounded to 6
decimals -- the production pattern for a 100-TB corpus: the
quantizer is a versioned artifact trained on a bounded sample,
NOT refit per query. Freezing also makes the IVF contract query
SQL-expressible: the DuckDB oracle embeds the same literals.

Regenerate: tools/gen_ivf_centroids.py (byte-identical given the
same sample).
"""

FIXED_CENTROIDS: list[list[float]] = [
'''


def main() -> None:
    rows = duckdb.connect().sql(SAMPLE_SQL).fetchall()
    sample = np.array([r[0] for r in rows], dtype=np.float64)
    cent = np.round(_kmeans_fit(sample, 16, seed=42), 6)
    with open("cdc_spark/functions/ivf_centroids.py", "w") as f:
        f.write(HEADER)
        for row in cent:
            f.write("    [" + ", ".join(repr(float(v)) for v in row) + "],\n")
        f.write("]\n")


if __name__ == "__main__":
    main()
