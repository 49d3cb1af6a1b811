"""Interleaved head-to-head of the contains_join payload/join-back shapes.

Measures, at BENCH-scale probe counts, the four probe-path shapes on a
narrow (bare 8-byte key) and a wide (~450 B/row) probe table:

  rows              full rows through the cogroup (one shuffle, Arrow
                    freight grows with width)
  digest+broadcast  (digest, shard) cogroup + broadcast hash join-back
                    (r4 default — probe rows never shuffled)
  digest+shuffle    the r3 shape (sort-merge join-back) kept as the
                    >10^8-distinct-key escape hatch

Shapes are interleaved A/B/A/B within one JVM so hypervisor-steal drift
hits all of them equally; per-shape best-of-REPS is reported with the
host-health score before/after.  Writes BENCH/probe_headtohead_r4.json
and prints it.

Usage: python tools/probe_headtohead.py [n_keys] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

N_KEYS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def host_health() -> float:
    import numpy as np

    t0 = time.perf_counter()
    x = np.arange(20_000_000, dtype="uint64")
    for _ in range(5):
        x = x * np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
    return round(100_000_000 / (time.perf_counter() - t0) / 1e6, 1)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from xorfilter_spark import bank as B

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-headtohead")
        .config("spark.sql.shuffle.partitions", str(max(CPUS * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1000000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    keys = spark.range(N_KEYS).select(F.col("id").alias("key"))
    bank = B.build_bank(
        keys, "key", variant="xor8", num_shards=max(64, CPUS * 8), dedup="kernel"
    ).cache()
    B.bank_len(bank)  # materialize + warm the worker pool

    probes = spark.range(N_KEYS // 2, N_KEYS + N_KEYS // 2).select(
        F.col("id").alias("key")
    )
    wide = probes.withColumn("payload", F.repeat(F.lit("x"), 400))

    shapes = {
        "narrow_rows": lambda: B.contains_join(
            probes, "key", bank, "hit", payload="rows"
        ),
        "narrow_digest_auto": lambda: B.contains_join(
            probes, "key", bank, "hit", payload="digest"
        ),
        "narrow_digest_broadcast": lambda: B.contains_join(
            probes, "key", bank, "hit", payload="digest", join_back="broadcast"
        ),
        "narrow_digest_shuffle": lambda: B.contains_join(
            probes, "key", bank, "hit", payload="digest", join_back="shuffle"
        ),
        "wide_rows": lambda: B.contains_join(
            wide, "key", bank, "hit", payload="rows"
        ),
        "wide_digest_auto": lambda: B.contains_join(
            wide, "key", bank, "hit", payload="digest"
        ),
        "wide_digest_broadcast": lambda: B.contains_join(
            wide, "key", bank, "hit", payload="digest", join_back="broadcast"
        ),
        "wide_digest_shuffle": lambda: B.contains_join(
            wide, "key", bank, "hit", payload="digest", join_back="shuffle"
        ),
    }

    h0 = host_health()
    results: dict[str, list[float]] = {k: [] for k in shapes}
    for _ in range(REPS):  # interleave: every rep touches every shape
        for name, fn in shapes.items():
            t0 = time.perf_counter()
            fn().agg(
                F.sum(F.col("hit").cast("long")).alias("h"),
                F.count("*").alias("n"),
            ).collect()
            results[name].append(round(time.perf_counter() - t0, 3))
    h1 = host_health()
    spark.stop()

    out = {
        "n_keys": N_KEYS,
        "cpus": CPUS,
        "reps": REPS,
        "health_before": h0,
        "health_after": h1,
        "best": {k: min(v) for k, v in results.items()},
        "samples": results,
    }
    with open("/root/repo/BENCH/probe_headtohead_r4.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
