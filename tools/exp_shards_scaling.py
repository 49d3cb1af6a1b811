"""One-off experiment (not evidence): build+probe wall time at 2 and 8
cores for shard counts 256 vs 1024 at 60M keys, interleaved in one
window, to see whether the L2-resident shard sizing (daf0210) changed
the 2->8 scaling shape or the drop in BENCH/scaling_latest_attempt.json
is window noise.  Writes /tmp/exp_shards_scaling.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyfiles import make_pyfiles_zip, spark_submit_path  # noqa: E402

N_KEYS = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000_000

WORKER = r"""
import json, sys, time
from pyspark.sql import SparkSession, functions as F
from xorfilter_spark import bank as B

cores = int(sys.argv[1]); n_keys = int(sys.argv[2]); shards = int(sys.argv[3])
spark = SparkSession.builder.appName(f"exp-{cores}-{shards}").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

keys = spark.range(n_keys).select(F.col("id").alias("key"))
B.bank_len(B.build_bank(keys.limit(200_000), "key", variant="xor8",
                        num_shards=min(shards, 64), dedup="kernel"))

t0 = time.perf_counter()
bank = B.build_bank(keys, "key", variant="xor8", num_shards=shards,
                    dedup="kernel").cache()
total = B.bank_len(bank)
el = time.perf_counter() - t0

t1 = time.perf_counter()
probes = spark.range(n_keys).select(F.col("id").alias("key"))
B.contains(probes, "key", bank, "hit").agg(
    F.sum(F.col("hit").cast("long"))).collect()
pel = time.perf_counter() - t1
spark.stop()
print(json.dumps({"cores": cores, "shards": shards,
                  "build_sec": round(el, 3), "probe_sec": round(pel, 3)}))
"""


def host_health() -> float:
    import numpy as np

    t0 = time.perf_counter()
    x = np.arange(20_000_000, dtype="uint64")
    for _ in range(5):
        x = x * np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
    return 100_000_000 / (time.perf_counter() - t0) / 1e6


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="exp-shards-")
    zip_path = make_pyfiles_zip(os.path.join(tmp, "xorfilter_spark.zip"))
    worker_py = os.path.join(tmp, "worker.py")
    with open(worker_py, "w") as f:
        f.write(WORKER)
    results = []
    # interleave configs so window drift hits all configs alike
    for rep in range(2):
        for cores in (2, 8):
            for shards in (256, 1024):
                h = host_health()
                cmd = [
                    spark_submit_path(),
                    "--master", f"local[{cores}]",
                    "--py-files", zip_path,
                    "--driver-memory", "48g",
                    "--conf", "spark.sql.shuffle.partitions=256",
                    "--conf", "spark.sql.adaptive.enabled=false",
                    "--conf",
                    "spark.sql.execution.arrow.maxRecordsPerBatch=500000",
                    "--conf", "spark.ui.enabled=false",
                    worker_py, str(cores), str(N_KEYS), str(shards),
                ]
                out = subprocess.run(cmd, capture_output=True, text=True,
                                     timeout=1800, cwd=tmp)
                lines = [l for l in out.stdout.splitlines()
                         if l.startswith("{")]
                if not lines:
                    print(f"cores={cores} shards={shards}: no output; "
                          f"{out.stderr[-800:]}", flush=True)
                    continue
                r = json.loads(lines[-1])
                r["health_before"] = round(h, 1)
                r["rep"] = rep
                results.append(r)
                print(json.dumps(r), flush=True)
    with open("/tmp/exp_shards_scaling.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
