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


def run_replay(
    binlog: str, table: str, cores: int, zip_path: str, pin: bool = False,
    images: str = "carry",
) -> dict:
    """One spark-submit replay run; returns the job's JSON result + wall.

    pin=True runs under `taskset -c 0-(cores-1)` so local[N] is a
    faithful N-core machine: without it the JVM's GC/JIT/IO threads (and
    the Python workers) spill onto every core of the host, which inflates
    small-N throughput and makes the N->4N efficiency meaningless —
    measured here, unpinned local[2] replays 80M events in 69s while a
    true 2-core run takes 451s on the same input."""
    shutil.rmtree(table, ignore_errors=True)
    t0 = time.monotonic()
    prefix = ["taskset", "-c", f"0-{cores - 1}"] if pin else []
    proc = subprocess.run(
        prefix + [
            "spark-submit", "--master", f"local[{cores}]",
            # session-builder memory conf is ignored under spark-submit
            # (driver JVM already started) — must be a submit flag.
            # Xms=Xmx + AlwaysPreTouch: an elastic heap on this microVM
            # spends 50-96% of CPU in kernel page-fault handling (measured
            # via vmstat); pre-touching at JVM start (before the timed
            # region) removes it.
            "--driver-memory", os.environ.get("CDC_BENCH_DRIVER_MEM", "12g"),
            "--conf",
            f"spark.driver.extraJavaOptions=-Xms{os.environ.get('CDC_BENCH_DRIVER_MEM', '12g')} -XX:+AlwaysPreTouch",
            # smaller splits -> one task per part file even after packing,
            # so high core counts get balanced scans
            "--conf", "spark.sql.files.maxPartitionBytes=33554432",
            "--conf", "spark.locality.wait=0",
            "--py-files", zip_path,
            os.path.join(REPO, "cdc_spark", "job.py"),
            "replay", "--binlog", binlog, "--table", table,
            "--shuffle-partitions", str(cores),
            "--images", images,
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
    ap.add_argument("--cores", default=None,
                    help="comma list of core counts to sweep (overrides --n; "
                         "efficiency reported for every (c, 4c) pair present)")
    ap.add_argument("--parts", type=int, default=32,
                    help="part files per epoch (input-scan splits ≥ 4n)")
    ap.add_argument("--repeat", type=int, default=3,
                    help="runs per core count; best (min seconds) is "
                         "reported — this sandbox is a microVM with "
                         "noisy-neighbor CPU (measured 1.6x spread on "
                         "identical runs), so single samples are "
                         "meaningless; raw samples are reported too")
    ap.add_argument("--pin-cpus", action="store_true",
                    help="taskset each run to exactly its core count — "
                         "REQUIRED for meaningful N->4N efficiency on a "
                         "many-core host (see run_replay docstring)")
    ap.add_argument("--images", default="full", choices=["full", "keys"],
                    help="feed shape: full before/after images (carry "
                         "replay) or key-only CT shape (fetch replay)")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--zipf", type=float, default=1.2,
                    help="key-skew exponent (GenConfig.zipf_s). 0.0 = "
                         "uniform keys — isolates the fetch fold's "
                         "hot-key critical path from the efficiency "
                         "measurement (the hottest Zipf-1.2 key's "
                         "timeline folds serially inside one task)")
    ap.add_argument("--out", default="BENCH_scaling.md",
                    help="markdown report path relative to the repo root "
                         "(deliberately NOT BENCH.md — that file carries "
                         "the curated full-scale analysis)")
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
        from cdc_spark.genlog import GenConfig, write_binlog, write_binlog_keys

        writer = write_binlog_keys if args.images == "keys" else write_binlog
        print(f"generating {args.events} events → {binlog}", file=sys.stderr)
        writer(
            GenConfig(n_events=args.events, n_docs=args.docs,
                      events_per_epoch=args.epoch_size, seed=42,
                      zipf_s=args.zipf),
            binlog,
            parts=args.parts,
        )

    core_list = (
        [int(c) for c in args.cores.split(",")] if args.cores else [args.n, 4 * args.n]
    )
    results = {}
    for cores in core_list:
        samples = []
        for rep in range(args.repeat):
            r = run_replay(binlog, os.path.join(work, f"table_{cores}"),
                           cores, zip_path, pin=args.pin_cpus,
                           images="fetch" if args.images == "keys" else "carry")
            samples.append(r)
            print(f"local[{cores}] run {rep + 1}/{args.repeat}: {r['seconds']}s",
                  file=sys.stderr)
        best = min(samples, key=lambda r: r["seconds"])
        best["events_per_sec"] = round(args.events / best["seconds"], 1)
        best["samples_sec"] = [r["seconds"] for r in samples]
        # steady-state: drop the first epoch of each run (a fresh JVM
        # pays 10-15s of core-count-independent codegen/JIT warmup — a
        # streaming job pays it once per deploy, not per epoch)
        steady = [
            (sum(r["epoch_events"][1:]), sum(r["epoch_seconds"][1:]))
            for r in samples
            if len(r.get("epoch_seconds", [])) > 1
        ]
        if steady:
            best_ev, best_sec = max(steady, key=lambda t: t[0] / t[1] if t[1] else 0)
            best["steady_events_per_sec"] = round(best_ev / best_sec, 1)
        results[cores] = best
        print(f"local[{cores}]: best {best['seconds']}s → {best['events_per_sec']} "
              f"events/s (samples: {best['samples_sec']})", file=sys.stderr)

    effs = {
        f"{c}->{4 * c}": round((results[4 * c]["events_per_sec"] / results[c]["events_per_sec"]) / 4, 3)
        for c in core_list if 4 * c in results
    }
    steady_effs = {
        f"{c}->{4 * c}": round(
            (results[4 * c]["steady_events_per_sec"] / results[c]["steady_events_per_sec"]) / 4, 3
        )
        for c in core_list
        if 4 * c in results
        and "steady_events_per_sec" in results[c]
        and "steady_events_per_sec" in results[4 * c]
    }
    rows_set = {r["final_rows"] for r in results.values()}
    summary = {
        "metric": "replay scaling efficiency (local[N] vs local[4N])",
        "images": args.images,
        "zipf": args.zipf,
        "events": args.events,
        "throughput": {c: results[c]["events_per_sec"] for c in core_list},
        "seconds": {c: results[c]["seconds"] for c in core_list},
        "efficiency": effs,
        "steady_throughput": {c: results[c].get("steady_events_per_sec") for c in core_list},
        "steady_efficiency": steady_effs,
        "samples_sec": {c: results[c]["samples_sec"] for c in core_list},
        "rows_match": len(rows_set) == 1,
        "final_rows": rows_set.pop(),
        "cpu_pinned": args.pin_cpus,
    }

    table_rows = "\n".join(
        f"| local[{c}] | {c} | {results[c]['seconds']} | {results[c]['events_per_sec']:,} "
        f"| {results[c].get('steady_events_per_sec', '—')} | {results[c]['samples_sec']} |"
        for c in core_list
    )
    eff_rows = "\n".join(
        f"- **{k} cores: {v} total-wall, {steady_effs.get(k, '—')} steady-state**"
        for k, v in effs.items()
    )
    min_tp = min(r["events_per_sec"] for r in results.values())
    pin_note = (
        "Each run is pinned with `taskset -c 0-(N-1)` so local[N] is a "
        "faithful N-core machine: unpinned, the JVM's GC/JIT/IO threads "
        "and the Python workers spill onto all 32 host cores, which "
        "inflates small-N throughput (unpinned local[2] replays the same "
        "input in 69s vs 451s truly 2-core) and makes N->4N efficiency "
        "meaningless." if args.pin_cpus else
        "Runs are NOT cpu-pinned — small-N numbers borrow the whole "
        "host's cores for JVM service threads; use --pin-cpus for "
        "efficiency claims."
    )
    bench_md = os.path.join(REPO, args.out)
    with open(bench_md, "w") as f:
        f.write(f"""# BENCH — scaling-efficiency evidence (north rule)

Same job (`spark-submit --py-files cdc_spark.zip cdc_spark/job.py replay`),
same input (seed-42 synthetic binlog, {args.events:,} change events over
{args.docs:,} docs, {args.epoch_size:,}-event epochs, {args.parts}
part-files/epoch), swept over parallelism levels — the sandbox stand-in
for N vs 4N executors. {pin_note}

| parallelism | shuffle partitions | best replay seconds | events/sec | steady events/sec | all samples (s) |
|---|---|---|---|---|---|
{table_rows}

Best-of-{args.repeat} per level: this sandbox is a Firecracker microVM
with noisy-neighbor CPU (identical back-to-back runs vary up to 1.6×),
so the best sample is the closest observable to the machine's actual
capability; all samples are shown for transparency. "Steady" excludes
each run's first epoch: a fresh JVM pays 10-15s of core-count-
independent codegen/JIT warmup, which a long-running streaming job pays
once per deploy — steady-state is the number that predicts cluster
behavior.

Scaling efficiency = (throughput_4N / throughput_N) / 4 (target ≥ 0.8):

{eff_rows}

Final table state identical across all runs: {summary['final_rows']}
rows (match = {summary['rows_match']}).

Reference context: the reference pipeline is hard-capped at 1 source
partition × 1,000 records/sec (BASELINE.md) ≈ **1,000 events/sec** —
every run above exceeds it by >{int(min_tp / 1000)}×.

Regenerate: `python tools/bench_scaling.py --events {args.events} --cores {",".join(str(c) for c in core_list)}{" --pin-cpus" if args.pin_cpus else ""}`.
""")
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
