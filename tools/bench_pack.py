"""Scaling probe for the P17 packer (emit_sequences).

Synthesizes a tokenized corpus IN-SESSION with spark.range (zero IO —
token arrays via F.sequence keyed on xxhash64(id), deterministic), then
times manifest + sequence emission end-to-end (materialized through the
noop sink). Same taskset-pinning methodology as bench_scaling.py:
local[N] under `taskset -c 0-(N-1)` is a faithful N-core machine.

Usage: python tools/bench_pack.py [--docs 2000000] [--seq-len 2048]
       [--cores 2,8] [--repeat 2]
Prints one JSON line; record results in BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(docs: int, seq_len: int, cores: int) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from cdc_spark.functions.packing import emit_sequences

    mem = os.environ.get("CDC_BENCH_DRIVER_MEM", "8g")
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("bench_pack")
        .config("spark.sql.shuffle.partitions", str(max(cores * 4, 8)))
        .config("spark.driver.memory", mem)
        .config("spark.driver.extraJavaOptions", f"-Xms{mem} -XX:+AlwaysPreTouch")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    corpus = spark.range(0, docs, 1, max(cores * 4, 16)).select(
        F.col("id").alias("doc_id"),
        F.sequence(
            F.lit(0),
            (F.pmod(F.xxhash64("id"), F.lit(32)) + F.lit(8)).cast("int"),
        ).alias("tokens"),
    )
    # steady-state: run the IDENTICAL plan twice in one session and keep
    # the best — a `limit()` warmup compiles a DIFFERENT codegen'd plan,
    # so a single cold sample still pays 1-2 s of core-count-independent
    # codegen that systematically deflates the fast level's efficiency
    out = emit_sequences(corpus, seq_len)
    samples = []
    for _ in range(2):
        t0 = time.monotonic()
        out.write.format("noop").mode("overwrite").save()
        samples.append(round(time.monotonic() - t0, 2))
    n_seq = out.count()  # untimed work-conservation check
    print(json.dumps({"cores": cores, "seconds": min(samples),
                      "cold_warm": samples, "sequences": int(n_seq)}))
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--cores", default="2,8")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--run", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.run is not None:
        run_one(args.docs, args.seq_len, args.run)
        return 0

    results: dict[int, list[dict]] = {}
    for cores in [int(c) for c in args.cores.split(",")]:
        results[cores] = []
        for _ in range(args.repeat):
            proc = subprocess.run(
                ["taskset", "-c", f"0-{cores - 1}", sys.executable,
                 os.path.abspath(__file__), "--run", str(cores),
                 "--docs", str(args.docs), "--seq-len", str(args.seq_len)],
                capture_output=True, text=True, cwd=REPO,
            )
            line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
            if proc.returncode != 0 or not line:
                print(proc.stderr[-2000:], file=sys.stderr)
                return 1
            results[cores].append(json.loads(line[-1]))
    levels = sorted(results)
    best = {c: min(r["seconds"] for r in results[c]) for c in levels}
    summary = {
        "docs": args.docs, "seq_len": args.seq_len,
        "samples": {str(c): [r["seconds"] for r in results[c]] for c in levels},
        "sequences": {str(c): results[c][0]["sequences"] for c in levels},
        "best_seconds": {str(c): best[c] for c in levels},
    }
    if len(levels) == 2 and levels[1] == 4 * levels[0]:
        summary["efficiency"] = round(
            (best[levels[0]] / best[levels[1]]) / 4, 3
        )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
