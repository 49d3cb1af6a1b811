"""spark-submit --py-files packaging evidence (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

Builds the xorfilter_spark.zip distribution unit, submits a small
build+probe job with ``spark-submit --master local[2] --py-files``, and
asserts the job imported the library FROM THE ZIP (not the repo dir) and
produced a correct bank — the packaging contract a real cluster needs.
"""

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = r"""
import json, sys
from pyspark.sql import SparkSession, functions as F
from xorfilter_spark import bank as B

assert "xorfilter_spark.zip" in (B.__file__ or ""), (
    f"must import from the --py-files zip, got {B.__file__}")
spark = SparkSession.builder.appName("submit-smoke").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
keys = spark.range(20_000).select(F.col("id").alias("key"))
bank = B.build_bank(keys, "key", variant="xor8", num_shards=4)
hits = (B.contains(keys, "key", bank, "hit")
        .agg(F.sum(F.col("hit").cast("long")).alias("n")).collect()[0]["n"])
print(json.dumps({"n_keys": B.bank_len(bank), "member_hits": int(hits)}))
spark.stop()
"""


def test_spark_submit_pyfiles_roundtrip():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from pyfiles import make_pyfiles_zip, spark_submit_path

    with tempfile.TemporaryDirectory(prefix="submit-smoke-") as tmp:
        zip_path = make_pyfiles_zip(os.path.join(tmp, "xorfilter_spark.zip"))
        job = os.path.join(tmp, "job.py")
        with open(job, "w") as f:
            f.write(JOB)
        out = subprocess.run(
            [
                spark_submit_path(),
                "--master", "local[2]",
                "--py-files", zip_path,
                "--conf", "spark.sql.shuffle.partitions=4",
                "--conf", "spark.ui.enabled=false",
                job,
            ],
            capture_output=True, text=True, timeout=300,
            cwd=tmp,  # not the repo: imports must come from the zip
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        assert lines, f"no result line; stderr tail: {out.stderr[-2000:]}"
        res = json.loads(lines[-1])
        assert res["n_keys"] == 20_000
        assert res["member_hits"] == 20_000  # zero false negatives
