"""Pure-CPU Spark scaling probe: sum(xxhash64) over 400M rows.

No shuffle beyond the final 1-row agg, no IO, negligible memory traffic
— measures whether the pinned core set actually multiplies compute on
today's host. Run: taskset -c 0-(N-1) python tools/cpu_probe.py N
"""
import sys
import time

from pyspark.sql import SparkSession, functions as F

cores = sys.argv[1]
spark = (
    SparkSession.builder.master(f"local[{cores}]")
    .config("spark.sql.shuffle.partitions", cores)
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
n = int(cores)
# warmup: JIT the codegen'd pipeline
spark.range(10_000_000, numPartitions=n * 8).select(
    F.max(F.xxhash64("id"))
).collect()
samples = []
for _ in range(4):
    t0 = time.monotonic()
    spark.range(1_600_000_000, numPartitions=n * 8).select(
        F.max(F.xxhash64(F.col("id"), F.col("id") + 1, F.col("id") * 3))
    ).collect()
    samples.append(round(time.monotonic() - t0, 2))
print(f"CPU_PROBE cores={cores} best={min(samples)}s samples={samples}")
spark.stop()
