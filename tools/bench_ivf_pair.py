"""VERDICT r3 item #8: is the persisted-IVF read path paying an
avoidable per-run listing/schema-inference cost?

Interleaved best-of-N timing of the three IVF contract queries
(in-memory ivf_topk, persisted ivf_index_topk, incrementally-maintained
index) on one session, each materialized via the noop sink. Interleaved
order cancels slow-drift noise on this microVM; best-of-N cancels
spikes. Prints one JSON line.

Usage: python tools/bench_ivf_pair.py [--sf /root/testdata/sf0.1] [--n 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from cdc_spark.session import get_spark

    spark = get_spark(app="bench_ivf", master="local[32]", shuffle_partitions=32)
    qs = entrymod.queries()
    names = ["emb_cosine_topk_ivf", "emb_cosine_topk_ivf_indexed",
             "emb_cosine_topk_ivf_inc"]
    # untimed warmup: JIT + parquet footer caches, same for all three
    qs[names[0]](spark, args.sf).write.format("noop").mode("overwrite").save()
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _rep in range(args.n):
        for name in names:
            t0 = time.monotonic()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.monotonic() - t0, 3))
    print(json.dumps({
        "metric": "ivf query seconds (interleaved, per-sample)",
        "sf": args.sf,
        "samples": samples,
        "best": {n: min(s) for n, s in samples.items()},
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
