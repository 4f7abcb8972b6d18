"""Scaling-efficiency evidence (BASELINE.json north rule).

The rule demands ≥0.8 throughput scaling efficiency between N and 4N
executors. No real cluster exists in this sandbox, so we evidence it the
sanctioned way: the SAME replay job (spark-submit --py-files, the real
cluster surface) on the SAME pre-generated binlog at two parallelism
levels (local[N] vs local[4N]), reporting events/sec at both and
efficiency = (throughput_4N / throughput_N) / 4.

Writes BENCH.md at the repo root and prints one JSON line.

Usage: python tools/bench_scaling.py [--events 2000000] [--n 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_replay(binlog: str, table: str, cores: int, zip_path: str) -> dict:
    """One spark-submit replay run; returns the job's JSON result + wall."""
    shutil.rmtree(table, ignore_errors=True)
    t0 = time.monotonic()
    proc = subprocess.run(
        [
            "spark-submit", "--master", f"local[{cores}]",
            "--py-files", zip_path,
            os.path.join(REPO, "cdc_spark", "job.py"),
            "replay", "--binlog", binlog, "--table", table,
            "--shuffle-partitions", str(cores),
        ],
        capture_output=True, text=True, check=True,
    )
    wall = time.monotonic() - t0
    last = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    out = json.loads(last)
    out["wall_incl_startup"] = round(wall, 2)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--epoch-size", type=int, default=250_000)
    ap.add_argument("--n", type=int, default=8, help="small parallelism (large = 4n)")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="cdc_scale_")
    os.makedirs(work, exist_ok=True)
    zip_path = os.path.join(work, "cdc_spark.zip")
    subprocess.run(
        ["zip", "-qr", zip_path, "cdc_spark"], cwd=REPO, check=True
    )
    binlog = os.path.join(work, "binlog")
    if not os.path.isdir(binlog):
        sys.path.insert(0, REPO)
        from cdc_spark.genlog import GenConfig, write_binlog

        print(f"generating {args.events} events → {binlog}", file=sys.stderr)
        write_binlog(
            GenConfig(n_events=args.events, n_docs=args.docs,
                      events_per_epoch=args.epoch_size, seed=42),
            binlog,
        )

    results = {}
    for cores in (args.n, 4 * args.n):
        r = run_replay(binlog, os.path.join(work, f"table_{cores}"), cores, zip_path)
        r["events_per_sec"] = round(args.events / r["seconds"], 1)
        results[cores] = r
        print(f"local[{cores}]: {r['seconds']}s → {r['events_per_sec']} events/s",
              file=sys.stderr)

    lo, hi = results[args.n], results[4 * args.n]
    eff = (hi["events_per_sec"] / lo["events_per_sec"]) / 4
    summary = {
        "metric": "replay scaling efficiency (local[N] vs local[4N])",
        "n": args.n,
        "events": args.events,
        "throughput_n": lo["events_per_sec"],
        "throughput_4n": hi["events_per_sec"],
        "seconds_n": lo["seconds"],
        "seconds_4n": hi["seconds"],
        "efficiency": round(eff, 3),
        "final_rows": hi["final_rows"],
        "rows_match": lo["final_rows"] == hi["final_rows"],
    }

    bench_md = os.path.join(REPO, "BENCH.md")
    with open(bench_md, "w") as f:
        f.write(f"""# BENCH — scaling-efficiency evidence (north rule)

Same job (`spark-submit --py-files cdc_spark.zip cdc_spark/job.py replay`),
same input (seed-42 synthetic binlog, {args.events:,} change events over
{args.docs:,} docs, {args.epoch_size:,}-event epochs), two parallelism
levels — the sandbox stand-in for N vs 4N executors:

| parallelism | shuffle partitions | replay seconds | events/sec |
|---|---|---|---|
| local[{args.n}] | {args.n} | {lo['seconds']} | {lo['events_per_sec']:,} |
| local[{4 * args.n}] | {4 * args.n} | {hi['seconds']} | {hi['events_per_sec']:,} |

**Scaling efficiency = (throughput_4N / throughput_N) / 4 =
{summary['efficiency']}** (target ≥ 0.8; final table states identical:
{lo['final_rows']} rows both runs = {summary['rows_match']}).

Reference context: the reference pipeline is hard-capped at 1 source
partition × 1,000 records/sec (BASELINE.md) ≈ **1,000 events/sec** —
both runs above exceed it by >{int(min(lo['events_per_sec'], hi['events_per_sec']) / 1000)}×.

Regenerate: `python tools/bench_scaling.py --events {args.events}`.
""")
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
