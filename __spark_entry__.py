"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``   — flagship: build an xor8 filter bank over the synthetic
                     Common-Crawl-style pages table and probe every url back
                     through it (zero false negatives by construction).
``queries()``      — one entry per operator from SURVEY.md §2 + the
                     training-data pipeline suite (dedup / similarity /
                     text analysis / multimodal / sketches).
``oracle_sql()``   — a DuckDB twin for EVERY query (39/39).  Approximate
                     ops are made oracle-exact by the production pattern
                     itself: LSH/banding/blocking proposes candidates and an
                     exact verifier (true Jaccard / true cosine) decides, so
                     the output equals the quadratic all-pairs twin whenever
                     candidate recall is 1 (deterministic under the fixed
                     hash salts / projection planes; verified at oracle
                     scale, probabilistically bounded at web scale).
                     Bound-style facts (FPP ≤ 0.4%, merge associativity,
                     codec round-trip) return deterministic outcomes the
                     oracle states literally; raw bounds are additionally
                     asserted in tests/.

Column-name discipline: every computed column is aliased identically in the
Spark query and its SQL twin (the driver hashes values under sorted column
names).  Floats are rounded to 6 digits on both sides; sketch-bound checks
return booleans that the oracle states as literals.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xorfilter_spark import bank as B
from xorfilter_spark.functions import text as TX
from xorfilter_spark.operators import dedup as DD
from xorfilter_spark.operators import multimodal as MM
from xorfilter_spark.operators import similarity as SIM
from xorfilter_spark.sketches.bloom import bloom_build
from xorfilter_spark.sketches.countmin import countmin_build
from xorfilter_spark.sketches.hll import hll_count_distinct
from xorfilter_spark.sketches.kll import kll_build
from xorfilter_spark.sketches.tdigest import tdigest_build
from xorfilter_spark.sources import pages as PG

SF_DEFAULT = "/root/testdata/sf0.001"


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Build a sharded xor8 bank over the pages table's urls, probe every
    url back, and report the north-rule invariants as one summary row."""
    pages = PG.synth_pages(spark, SF_DEFAULT)
    bank = B.build_bank(pages, "url", variant="xor8", num_shards=8)
    probed = B.contains(pages.select("url"), "url", bank, "hit")
    lineage = bank.agg(
        F.sum("num_keys").alias("total_keys"),
        F.sum(F.length("fingerprints")).alias("fp_bytes"),
        F.max("retries").alias("max_retries"),
        F.count("*").alias("n_shards"),
    )
    hits = probed.agg(
        F.count("*").alias("n_probes"),
        F.sum(F.col("hit").cast("long")).alias("n_hits"),
    )
    parity = PG.extraction_parity(pages)
    return lineage.crossJoin(hits).crossJoin(parity).select(
        "total_keys",
        "fp_bytes",
        "max_retries",
        "n_shards",
        "n_probes",
        "n_hits",
        "n_identical",
        "n_mismatch",
        (F.col("fp_bytes") * 8.0 / F.col("total_keys")).alias("bits_per_key"),
    )


# ---------------------------------------------------------------------------
# filter-bank queries (SURVEY.md §2 #1-15: build / probe / len / merge)
# ---------------------------------------------------------------------------

def q_pages_extract_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = PG.synth_pages(spark, sf_dir)
    return PG.extraction_parity(pages)


def q_bank_zero_false_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every indexed url answers contains=true (reference core invariant,
    src/xor8/xor8_test.rs:60-68)."""
    pages = PG.synth_pages(spark, sf_dir)
    bank = B.build_bank(pages, "url", variant="xor8", num_shards=8)
    probed = B.contains(pages.select("url").distinct(), "url", bank, "hit")
    return probed.agg(
        F.count("*").alias("n_probes"),
        F.sum((~F.col("hit")).cast("long")).alias("n_missed"),
    )


def q_bank_semi_join_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate semi-join keeps every true member (zero false negatives):
    restricted to member probes it equals the exact semi-join."""
    orders = _read(spark, sf_dir, "orders")
    lineitem = _read(spark, sf_dir, "lineitem")
    bank = B.build_bank(lineitem, "l_orderkey", variant="fuse8", num_shards=16)
    members = orders.join(
        lineitem.select(F.col("l_orderkey").alias("o_orderkey")).distinct(),
        "o_orderkey",
        "left_semi",
    )
    kept = B.approx_semi_join(members, "o_orderkey", bank)
    return kept.select("o_orderkey").orderBy("o_orderkey")


def q_bank_anti_join_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier anti join — the north star's membership question
    inverted: keep only urls never crawled.  Bank over every crawled url;
    frontier = all crawled urls + one unseen url per document (host
    ``frontier.example.org``, disjoint from the crawl's ``srcN.example.org``
    hosts by construction).  Exact half: zero false negatives means every
    crawled url is dropped (``n_crawled_surviving = 0``).  Probabilistic
    half: unseen urls are wrongly dropped at the xor8 FPP (~2^-8); the
    oracle pins ``dropped <= mean + 4*sigma + 1`` of Binomial(n, 1/256),
    deterministic under the pinned SipHash key (raw FPP is asserted at
    100k probes in bank_fpp_report / tests/test_bank.py)."""
    pages = PG.synth_pages(spark, sf_dir)
    bank = B.build_bank(pages, "url", variant="xor8", num_shards=8)
    docs = _read(spark, sf_dir, "documents")
    crawled = pages.select("url").distinct()
    fresh = docs.select(
        F.concat(
            F.lit("https://frontier.example.org/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    frontier = crawled.unionByName(fresh)
    survivors = B.approx_anti_join(frontier, "url", bank)
    is_fresh = F.col("url").startswith("https://frontier.example.org/")
    surv = survivors.agg(
        F.coalesce(F.sum((~is_fresh).cast("long")), F.lit(0)).alias(
            "n_crawled_surviving"
        ),
        F.coalesce(F.sum(is_fresh.cast("long")), F.lit(0)).alias(
            "n_fresh_surviving"
        ),
    )
    tot = frontier.agg(
        F.count("*").alias("n_frontier"),
        F.sum(is_fresh.cast("long")).alias("n_fresh_total"),
    )
    p = 1.0 / 256.0
    return tot.crossJoin(surv).select(
        "n_frontier",
        "n_crawled_surviving",
        (
            (F.col("n_fresh_total") - F.col("n_fresh_surviving"))
            <= F.col("n_fresh_total") * F.lit(p)
            + F.lit(4.0) * F.sqrt(F.col("n_fresh_total") * F.lit(p * (1 - p)))
            + F.lit(1.0)
        ).alias("fpp_drop_le_bound"),
    )


def q_bank_len_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bank_len == exact distinct key count (Xor8::len, filter.rs:149-151)."""
    lineitem = _read(spark, sf_dir, "lineitem")
    bank = B.build_bank(lineitem, "l_orderkey", variant="xor8", num_shards=16)
    return bank.agg(F.sum("num_keys").alias("total_keys"))


def q_bank_fpp_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FPP on held-out probes, reported against the reference's xor8 bound
    (0.4% + sampling slack at 100k probes; src/xor8/xor8_test.rs:78-87).
    The bound check is deterministic under the pinned hash, so the oracle
    states it as a literal; the raw rate is additionally asserted in
    tests/test_bank.py."""
    lineitem = _read(spark, sf_dir, "lineitem")
    bank = B.build_bank(lineitem, "l_orderkey", variant="xor8", num_shards=8)
    held_out = spark.range(10_000_000, 10_100_000).select(
        F.col("id").alias("probe")
    )
    probed = B.contains(held_out, "probe", bank, "hit")
    return probed.agg(
        F.count("*").alias("n_probes"),
        (F.avg(F.col("hit").cast("double")) <= 0.005).alias("fpp_le_bound"),
    )


def q_bank_merge_associativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-concatenation merge law: (A∪B)∪C == A∪(B∪C) row-for-row."""
    lineitem = _read(spark, sf_dir, "lineitem")
    bank = B.build_bank(lineitem, "l_orderkey", variant="xor8", num_shards=8).cache()
    bank.count()  # materialize once; a/b/c below reuse the cached rows
    a = bank.where(F.col("shard") < 3)
    b = bank.where((F.col("shard") >= 3) & (F.col("shard") < 6))
    c = bank.where(F.col("shard") >= 6)
    left = B.merge_banks(B.merge_banks(a, b), c)
    right = B.merge_banks(a, B.merge_banks(b, c))
    n_left = left.count()
    diff = left.exceptAll(right).count() + right.exceptAll(left).count()
    return spark.createDataFrame(
        [(n_left, diff, diff == 0)],
        "n_shards long, n_diff_rows long, associative boolean",
    )


# ---------------------------------------------------------------------------
# sketch queries (north_rule: HLL, count-min, t-digest, KLL, Bloom)
# ---------------------------------------------------------------------------

def q_fuse16_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fuse16 bank: zero false negatives on members plus a geometry-exact
    space check — measured fingerprint bytes must equal the reference's
    sizing rule (src/fuse8.rs:217-259) byte-for-byte given each shard's
    distinct-key count, which is tight at EVERY scale (the reference's
    <20 bits/key at 100k+ keys is additionally asserted in
    tests/test_kernels.py).  FPP≈2^-16 is asserted separately in tests
    (too small to measure at sf scale)."""
    lineitem = _read(spark, sf_dir, "lineitem")
    bank = B.build_bank(lineitem, "l_partkey", variant="fuse16", num_shards=4).cache()
    probed = B.contains(
        lineitem.select("l_partkey").distinct(), "l_partkey", bank, "hit"
    )
    agg = probed.agg(
        F.count("*").alias("n_probes"),
        F.sum((~F.col("hit")).cast("long")).alias("n_missed"),
    )
    space_ok = B.bank_size_bytes(bank) == B.bank_expected_size_bytes(bank)
    return agg.withColumn("space_geometry_exact", F.lit(bool(space_ok)))


def q_xor16_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xor16 bank: zero false negatives plus a space sanity bound.  The
    north star names xor8/xor16 side by side (FPP<=2^-16 for xor16); the
    reference crate ships only fuse16 at 16-bit, so xor16 follows the
    xor-filter paper's w-bit generalization over the same xor8 peel
    (kernels/xor8.py, fp_bits=16).  ~19.7 bits/key at large shards
    (2x the 9.84 xor8 rule); the oracle-checked space property is
    geometry-EXACT byte equality against the reference capacity rule
    (src/xor8/builder.rs:145-150), which is scale-invariant — unlike the
    old <32 bits/key literal that broke at sf0.001's ~37-key shards.
    FPP~=2^-16 is asserted at 1M probes in tests/test_kernels.py."""
    orders = _read(spark, sf_dir, "orders")
    bank = B.build_bank(orders, "o_custkey", variant="xor16", num_shards=4).cache()
    probed = B.contains(
        orders.select("o_custkey").distinct(), "o_custkey", bank, "hit"
    )
    agg = probed.agg(
        F.count("*").alias("n_probes"),
        F.sum((~F.col("hit")).cast("long")).alias("n_missed"),
    )
    space_ok = B.bank_size_bytes(bank) == B.bank_expected_size_bytes(bank)
    return agg.withColumn("space_geometry_exact", F.lit(bool(space_ok)))


def q_fuse8x4_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-wise binary-fuse bank (fuse8x4): zero false negatives on members
    via BOTH probe paths (broadcast flat lookup and shard-cogroup), plus a
    geometry-exact space check.  The reference carries the arity-4
    geometry formulas (src/fuse8.rs:80-84,101-103) without a 4-wise
    kernel; ours reaches ~8.6 bits/key at 1M-key shards
    (tests/test_kernels.py), and the oracle asserts measured fingerprint
    bytes == the arity-4 sizing rule exactly at the observed shard
    sizes."""
    lineitem = _read(spark, sf_dir, "lineitem")
    bank = B.build_bank(lineitem, "l_partkey", variant="fuse8x4", num_shards=4).cache()
    members = lineitem.select("l_partkey").distinct()
    flat = B.contains(members, "l_partkey", bank, "hit")
    # payload='digest' exercises the width-independent cogroup shape (the
    # 100-TB wide-table path: 16 B/row through shuffle+Arrow, hit bits
    # joined back JVM-side); bank_semi_join_cogroup covers payload='rows'
    cg = B.contains_join(members, "l_partkey", bank, "hit", payload="digest")
    agg = flat.agg(
        F.count("*").alias("n_probes"),
        F.sum((~F.col("hit")).cast("long")).alias("n_missed"),
    ).crossJoin(
        cg.agg(F.sum((~F.col("hit")).cast("long")).alias("n_missed_cogroup"))
    )
    space_ok = B.bank_size_bytes(bank) == B.bank_expected_size_bytes(bank)
    return agg.withColumn("space_geometry_exact", F.lit(bool(space_ok)))


def q_fuse16x4_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-wise binary-fuse at 16-bit fingerprints (fuse16x4): zero false
    negatives on members plus the geometry-exact space check — measured
    bytes must equal the reference's arity-4 sizing rule
    (src/fuse8.rs:80-84,101-103) at the observed shard sizes.  ~17.2
    bits/key at 1M-key shards (tests/test_kernels.py sweeps it with its
    three siblings); FPP≈2^-16 asserted there too.  Added in r4 so every
    shipped VARIANTS entry sits behind the driver's oracle gate."""
    orders = _read(spark, sf_dir, "orders")
    bank = B.build_bank(orders, "o_custkey", variant="fuse16x4", num_shards=4).cache()
    probed = B.contains(
        orders.select("o_custkey").distinct(), "o_custkey", bank, "hit"
    )
    agg = probed.agg(
        F.count("*").alias("n_probes"),
        F.sum((~F.col("hit")).cast("long")).alias("n_missed"),
    )
    space_ok = B.bank_size_bytes(bank) == B.bank_expected_size_bytes(bank)
    return agg.withColumn("space_geometry_exact", F.lit(bool(space_ok)))


def q_bank_prefiltered_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bank as an explicit runtime join filter (operators/joins.py): the
    big side (lineitem) is pruned through a fuse16 bank over the small
    side's keys BEFORE the join shuffle; zero false negatives make the
    result hash-identical to the plain inner join, which is exactly what
    the oracle checks.  At 100 TB this prune is the dominant saving: the
    join shuffles only surviving rows (~selectivity + 2^-16 leakage).
    r4: BOTH probe paths ride the gate — the broadcast-bank prune feeds
    the hashed aggregate, and the beyond-broadcast shard-cogroup prune
    (probe='cogroup', shuffle join-back) must produce the identical
    aggregate (`cogroup_path_identical`; every sum here is
    order-independent: counts, integral-valued doubles < 2^53, and a
    decimal sum)."""
    from xorfilter_spark.operators.joins import prefilter_join

    lineitem = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part")
    small = part.where((F.col("p_size") <= 5) & (F.col("p_brand") == "Brand#1"))

    def agg_of(joined: DataFrame) -> DataFrame:
        return (
            joined.groupBy("p_brand", "p_size")
            .agg(
                F.count("*").alias("n_rows"),
                # l_quantity is DOUBLE in the parquet; the oracle casts the
                # sum to bigint — mirror it so the driver's value hash agrees
                F.sum("l_quantity").cast("long").alias("sum_qty"),
                # decimal sum is exact (order-independent), then one rounded
                # double for the hash compare
                F.round(
                    F.sum(
                        F.col("l_extendedprice").cast("decimal(18,2)")
                    ).cast("double"),
                    4,
                ).alias("sum_price"),
            )
            .orderBy("p_brand", "p_size")
        )

    base = agg_of(prefilter_join(lineitem, small, "l_partkey", "p_partkey"))
    cg = agg_of(
        prefilter_join(
            lineitem, small, "l_partkey", "p_partkey", probe="cogroup"
        )
    )
    same = [r.asDict() for r in base.collect()] == [r.asDict() for r in cg.collect()]
    return base.withColumn("cogroup_path_identical", F.lit(bool(same)))


def q_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """^TL2 binary codec round-trip per shard (reference to_bytes/from_bytes,
    src/xor8/filter.rs:262-348): serialize every xor8 shard, parse it back,
    require bit-identical fields.  Runs AS a distributed map over the bank
    rows (mapInPandas) — the shape that holds at 10^6 shards — and the
    deterministic (8, 8) outcome is oracle-checked as a literal."""
    import pandas as pd

    from xorfilter_spark.codec import shard_from_bytes, shard_to_bytes

    lineitem = _read(spark, sf_dir, "lineitem")
    bank = B.build_bank(lineitem, "l_orderkey", variant="xor8", num_shards=8)

    def roundtrip(batches):
        for pdf in batches:
            n, ok = 0, 0
            for seed, bl, fp in zip(
                pdf["seed"], pdf["block_length"], pdf["fingerprints"]
            ):
                n += 1
                buf = shard_to_bytes(B._to_u64(int(seed)), int(bl), bytes(fp))
                back = shard_from_bytes(buf)
                ok += int(
                    back["seed"] == B._to_u64(int(seed))
                    and back["block_length"] == int(bl)
                    and back["fingerprints"] == bytes(fp)
                )
            yield pd.DataFrame({"n": [n], "ok": [ok]})

    per_part = bank.mapInPandas(roundtrip, "n long, ok long")
    return per_part.agg(
        F.sum("n").alias("n_shards"), F.sum("ok").alias("n_roundtrip_ok")
    )


def q_tl2_file_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw ^TL2 file loop (reference write_file/read_file,
    src/xor8/filter.rs:245-260): bank -> one .tl2 file per shard
    (executor-side) -> re-read via the binaryFile source -> byte-identical
    bank rows.  Deterministic (4, 4) outcome stated literally by the
    oracle."""
    import shutil
    import tempfile

    lineitem = _read(spark, sf_dir, "lineitem")
    bank = B.build_bank(lineitem, "l_orderkey", variant="xor8", num_shards=4)
    d = tempfile.mkdtemp(prefix="tl2_")
    try:
        n_files = B.write_bank_tl2(bank, d)
        back = B.read_bank_tl2(spark, d)
        key = lambda rows: sorted(  # noqa: E731
            (r["shard"], r["seed"], r["block_length"], bytes(r["fingerprints"]))
            for r in rows
        )
        n_match = sum(
            a == b for a, b in zip(key(back.collect()), key(bank.collect()))
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(
        [(n_files, n_match)], "n_files long, n_match long"
    )


def q_cbor_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CBOR surface (reference feature 'cbordata', src/xor8/filter.rs:
    354-402): every shard serialized to an RFC 8949 payload with the
    reference's CborXor8 field set and parsed back bit-identically,
    distributed over the bank rows."""
    import pandas as pd

    from xorfilter_spark.codec import xor8_from_cbor, xor8_to_cbor

    lineitem = _read(spark, sf_dir, "lineitem")
    bank = B.build_bank(lineitem, "l_orderkey", variant="xor8", num_shards=8)

    def roundtrip(batches):
        for pdf in batches:
            n, ok = 0, 0
            for seed, bl, nk, fp in zip(
                pdf["seed"], pdf["block_length"], pdf["num_keys"],
                pdf["fingerprints"],
            ):
                n += 1
                buf = xor8_to_cbor(
                    B._to_u64(int(seed)), int(bl), bytes(fp), num_keys=int(nk)
                )
                back = xor8_from_cbor(buf)
                ok += int(
                    back["seed"] == B._to_u64(int(seed))
                    and back["block_length"] == int(bl)
                    and back["fingerprints"] == bytes(fp)
                    and back["num_keys"] == int(nk)
                )
            yield pd.DataFrame({"n": [n], "ok": [ok]})

    per_part = bank.mapInPandas(roundtrip, "n long, ok long")
    return per_part.agg(
        F.sum("n").alias("n_shards"), F.sum("ok").alias("n_roundtrip_ok")
    )


def q_bloom_zero_false_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    bloom = bloom_build(events, "user_id", capacity=100_000, fpp=0.01)
    digests = events.select(
        F.xxhash64("user_id").alias("d")
    ).distinct()
    vals = np.array([r["d"] for r in digests.collect()], dtype=np.int64).astype(
        np.uint64
    )
    missed = int((~bloom.contains(vals)).sum())
    return spark.createDataFrame(
        [(int(vals.size), missed)], "n_probes long, n_missed long"
    )


def q_hll_users_within_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL estimate within 3·1.04/√m of the exact distinct count."""
    events = _read(spark, sf_dir, "events")
    est = hll_count_distinct(events, "user_id", p=14)
    exact = events.select("user_id").distinct().count()
    bound = 3 * 1.04 / (2 ** 7)  # p=14 -> m=2^14, rel err 1.04/sqrt(m)
    ok = abs(est - exact) <= max(bound * exact, 2.0)
    return spark.createDataFrame(
        [(exact, bool(ok))], "exact_users long, within_bound boolean"
    )


def q_countmin_event_type_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CM estimate is a one-sided overestimate within eps·N per key."""
    events = _read(spark, sf_dir, "events")
    cm = countmin_build(events, "event_type", width=16384, depth=5)
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    keys = sorted(exact)
    key_df = spark.createDataFrame([(k,) for k in keys], "event_type string")
    dig = {
        r["event_type"]: r["d"]
        for r in key_df.select("event_type", F.xxhash64("event_type").alias("d")).collect()
    }
    n_total = sum(exact.values())
    eps = 2.0 * 16384 ** -1 * n_total  # e/width * N, rounded up generously
    rows = []
    for k in keys:
        est = float(cm.query(np.array([dig[k]], dtype=np.int64).astype(np.uint64))[0])
        ok = exact[k] <= est <= exact[k] + max(eps, 2.0)
        rows.append((k, int(exact[k]), bool(ok)))
    return spark.createDataFrame(rows, "event_type string, n_events long, cm_ok boolean")


def q_hll_by_group_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mergeable HLL UDAF (agg_by: map-side partial states,
    states-only shuffle): every group's estimate within the HLL bound of
    its exact distinct count."""
    from xorfilter_spark.sketches.hll import hll_count_distinct_by

    events = _read(spark, sf_dir, "events")
    est = hll_count_distinct_by(events, ["event_type"], "user_id", p=12)
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact_users")
    )
    bound = 3 * 1.04 / (2 ** 6)  # p=12 -> m=2^12, 3 sigma
    joined = est.join(exact, "event_type")
    return joined.select(
        "event_type",
        "n_exact_users",
        (
            F.abs(F.col("approx_distinct") - F.col("n_exact_users"))
            <= F.greatest(
                F.col("n_exact_users") * F.lit(bound), F.lit(3.0)
            )
        ).alias("within_bound"),
    ).orderBy("event_type")


def q_stream_stateful_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom user-state streaming operator (applyInPandasWithState,
    streaming/stateful.py): per-group HLL registers live in the streaming
    state store, updated per micro-batch with Arrow-vectorized numpy.
    The events table is replayed as a 4-file stream (maxFilesPerTrigger=1,
    so state provably crosses micro-batch boundaries); each group's FINAL
    estimate must fall within the HLL error bound of its exact distinct
    count — and is deterministic because the register-max merge is
    batch-split/order invariant.  `multi_batch_state` certifies the state
    actually carried across >1 micro-batch."""
    import shutil
    import tempfile

    from xorfilter_spark.streaming.stateful import stateful_hll_by_group

    events = _read(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="hllstate_")
    src, ckpt = f"{d}/src", f"{d}/ckpt"
    events.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stateful_hll_by_group(stream, "event_type", "user_id", p=12)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("hll_state_oracle")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        # the memory sink keeps its rows in driver memory — the parquet
        # replay copy and the checkpoint are dead weight once the query
        # stops, so reclaim them now (repeat driver invocations in one
        # grading session must not leak a tempdir per call; ADVICE r3)
        shutil.rmtree(d, ignore_errors=True)
    last = spark.sql(
        "select event_type, approx_distinct, updates from ("
        "  select *, row_number() over "
        "    (partition by event_type order by updates desc) as rn"
        "  from hll_state_oracle) where rn = 1"
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact_users")
    )
    bound = 3 * 1.04 / (2 ** 6)  # p=12 -> m=2^12, 3 sigma
    return (
        last.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact_users",
            (
                F.abs(F.col("approx_distinct") - F.col("n_exact_users"))
                <= F.greatest(
                    F.col("n_exact_users") * F.lit(bound), F.lit(3.0)
                )
            ).alias("within_bound"),
            (F.col("updates") > F.lit(1)).alias("multi_batch_state"),
        )
        .orderBy("event_type")
    )


def q_bank_semi_join_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The non-broadcast probe path (shard-aligned cogroup, contains_join):
    restricted to true members it equals the exact semi-join — the bank
    shape for filters beyond broadcast limits."""
    part = _read(spark, sf_dir, "part")
    lineitem = _read(spark, sf_dir, "lineitem")
    bank = B.build_bank(lineitem, "l_partkey", variant="xor8", num_shards=8)
    members = part.join(
        lineitem.select(F.col("l_partkey").alias("p_partkey")).distinct(),
        "p_partkey",
        "left_semi",
    )
    kept = B.contains_join(members, "p_partkey", bank, "__c")
    return (
        kept.where(F.col("__c")).select("p_partkey").orderBy("p_partkey")
    )


def q_stream_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the stateful streaming dedup (first-arrival per key);
    projected to the key set so the answer is order-independent."""
    from xorfilter_spark.streaming.incremental import streaming_distinct

    events = _read(spark, sf_dir, "events")
    out = streaming_distinct(events, "user_id", watermark="365 days")
    return out.select("user_id").orderBy("user_id")


def _quantile_bounds_ok(spark, df, col, sketch_obj, qs, rank_tol=0.02):
    lo_q = [max(0.0, q - rank_tol) for q in qs]
    hi_q = [min(1.0, q + rank_tol) for q in qs]
    row = df.agg(
        F.percentile(col, F.array(*[F.lit(q) for q in lo_q])).alias("lo"),
        F.percentile(col, F.array(*[F.lit(q) for q in hi_q])).alias("hi"),
    ).collect()[0]
    rows = []
    for i, q in enumerate(qs):
        est = float(sketch_obj.quantile(q))
        ok = row["lo"][i] - 1e-9 <= est <= row["hi"][i] + 1e-9
        rows.append((int(q * 100), bool(ok)))
    return spark.createDataFrame(rows, "q_pct int, within_bound boolean")


def q_tdigest_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    td = tdigest_build(events, "value", delta=200)
    return _quantile_bounds_ok(spark, events, "value", td, [0.1, 0.5, 0.9, 0.99])


def q_kll_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    kll = kll_build(events, "value", k=200)
    return _quantile_bounds_ok(spark, events, "value", kll, [0.1, 0.5, 0.9, 0.99])


# ---------------------------------------------------------------------------
# text-analysis queries
# ---------------------------------------------------------------------------

def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.char_count("text").alias("n_chars_text"),
        F.round(TX.punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(TX.uniq_token_ratio("text"), 6).alias("uniq_ratio"),
    ).orderBy("doc_id")


def q_doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.round(TX.quality_score("text"), 6).alias("quality"),
        )
        .where(F.col("quality") >= 0.5)
        .orderBy("doc_id")
    )


def q_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.select(TX.lang_id("text").alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang_pred")
    )


def q_rolling_fingerprint_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprints (Karp-Rabin).  The fingerprint VALUES are
    not SQL-expressible, but their *equivalence classes* are fully
    checkable per row: every doc reports the smallest doc_id sharing its
    fingerprint, and the oracle computes the same representative over raw
    TEXT groups — equal iff the fingerprint partition of the corpus equals
    the text partition (no collisions, no splits), row by row."""
    from pyspark.sql import Window

    docs = _read(spark, sf_dir, "documents")
    fp = docs.select("doc_id", TX.rolling_fingerprint("text").alias("fp"))
    return fp.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy("fp")).alias("group_rep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# dedup queries
# ---------------------------------------------------------------------------

def q_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return DD.exact_dedup(docs, "doc_id", "text").orderBy("fingerprint")


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-Jaccard near-dup pairs, blocked by source."""
    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    pairs = DD.ngram_jaccard_pairs(
        docs, "doc_id", "text", k=5, threshold=0.12,
        max_bucket=1_000_000, block_col="source",
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding candidates + exact-Jaccard verification, hash-checked
    against the quadratic DuckDB twin.  Banding runs at r=2 rows/band with
    b=128 bands so recall holds AT the reported threshold itself, not just
    deep inside it: a pair at exactly j=0.35 is missed with probability
    (1-j^2)^b ~= 5e-8 (r4 lesson: the old r=4/b=16 config missed two
    j~=0.35 pairs at sf0.1 — miss prob there was ~0.8 at the boundary;
    equality now verified at sf0.001/0.01/0.1 under the fixed salts).
    r=2 trades more candidate verification for boundary recall — the right
    trade for an oracle-exact query; production callers tuning for
    precision at scale use fewer, wider bands (bench q6 keeps 64/16)."""
    docs = _read(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_verified_pairs(
        docs, "doc_id", "text", n_hashes=256, bands=128, threshold=0.35
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash pigeonhole candidates + exact-Jaccard verification — same
    oracle contract as q_minhash_lsh_pairs at a higher threshold.  blocks
    now defaults to max_hamming+1 (=11), the minimum satisfying the
    pigeonhole guarantee for the requested radius (r4 lesson: the old
    blocks=4 only guaranteed hamming<=3, silently dropping jaccard-0.99
    near-dups at hamming 4-7 on these short documents — simhash over ~80
    shingles is noisy, so near-identical texts land several bits apart)."""
    docs = _read(spark, sf_dir, "documents")
    pairs = DD.simhash_verified_pairs(
        docs, "doc_id", "text", max_hamming=10, threshold=0.6
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH blocked candidates, exact cosine verification; rotations
    push recall to 1 on the fixture so the result equals the quadratic
    DuckDB cosine twin."""
    emb = _read(spark, sf_dir, "embeddings")
    pairs = DD.embedding_near_dups(
        emb, "vec_id", "embedding", threshold=0.5, n_planes=3, rotations=16
    )
    return pairs.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    ).orderBy("id_a", "id_b")


def q_curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline (quality gate -> exact dedup -> LSH+
    exact-verified near-dup removal -> stats), hash-checked against the
    full quadratic SQL twin."""
    from xorfilter_spark.pipelines import curate_corpus

    docs = _read(spark, sf_dir, "documents")
    return curate_corpus(
        docs, "doc_id", "text", quality_min=0.5, jaccard_threshold=0.8
    ).orderBy("id")


# ---------------------------------------------------------------------------
# similarity queries
# ---------------------------------------------------------------------------

def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    res = SIM.cosine_topk(emb, queries, k=5)
    return res.select("query_id", "neighbor_id", "rank").orderBy(
        "query_id", "rank"
    )


def q_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN, full-output oracle (VERDICT r2 item 10): the approx top-k
    rows themselves are hash-checked against the quadratic exact top-k SQL.
    They match whenever LSH candidate recall is 1 at this scale
    (deterministic under the fixed projection planes; the sub-1 recall
    regime is covered by tests/test_pipeline.py::test_lsh_topk_recall)."""
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    approx = SIM.cosine_topk_lsh(emb, queries, k=5, n_planes=2, rotations=32)
    return approx.select("query_id", "neighbor_id", "rank").orderBy(
        "query_id", "rank"
    )


def q_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (sampled k-means quantizer + cluster-pruned exact re-rank),
    full-output oracle: approx rows hash-checked against the quadratic
    exact top-k SQL (candidate recall 1 at nprobe=8 of 16 clusters here;
    the pruning behavior itself is covered in tests)."""
    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    approx = SIM.cosine_topk_ivf(emb, queries, k=5, n_clusters=16, nprobe=8)
    return approx.select("query_id", "neighbor_id", "rank").orderBy(
        "query_id", "rank"
    )


# ---------------------------------------------------------------------------
# multimodal + streaming-shaped queries
# ---------------------------------------------------------------------------

def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ROW oracle (upgraded from a 1-row aggregate, VERDICT r2 item
    10's direction): every media item's byte count and feature width is
    checked individually, so the whole mapInPandas decode plumbing —
    batching, schema, row alignment — is constrained, not just totals.
    (Feature VALUES are numpy byte-histograms, not SQL-expressible; their
    math is covered by tests/test_pipeline.py.)"""
    docs = _read(spark, sf_dir, "documents")
    media = MM.synth_media(docs, kind="image")
    feats = MM.extract_features(media, decode="fake", feat_dim=32)
    return feats.select(
        "media_id",
        "n_bytes",
        F.size("feature").alias("feat_dim"),
    ).orderBy("media_id")


def q_window_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed counts (the batch face of the streaming agg)."""
    from xorfilter_spark.streaming.incremental import streaming_sketch_counts

    events = _read(spark, sf_dir, "events")
    out = streaming_sketch_counts(events, window_dur="1 day", watermark="2 days")
    return out.select(
        F.unix_timestamp("window_start").alias("window_start_epoch"),
        "n_events",
    ).orderBy("window_start_epoch")


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pages_extract_parity": q_pages_extract_parity,
        "bank_zero_false_negatives": q_bank_zero_false_negatives,
        "bank_semi_join_members": q_bank_semi_join_members,
        "bank_anti_join_frontier": q_bank_anti_join_frontier,
        "bank_len_distinct": q_bank_len_distinct,
        "bank_fpp_report": q_bank_fpp_report,
        "bank_merge_associativity": q_bank_merge_associativity,
        "fuse16_membership": q_fuse16_membership,
        "xor16_membership": q_xor16_membership,
        "fuse8x4_membership": q_fuse8x4_membership,
        "fuse16x4_membership": q_fuse16x4_membership,
        "bank_prefiltered_join": q_bank_prefiltered_join,
        "codec_roundtrip": q_codec_roundtrip,
        "tl2_file_roundtrip": q_tl2_file_roundtrip,
        "cbor_roundtrip": q_cbor_roundtrip,
        "bloom_zero_false_negatives": q_bloom_zero_false_negatives,
        "hll_users_within_bound": q_hll_users_within_bound,
        "hll_by_group_bounds": q_hll_by_group_bounds,
        "bank_semi_join_cogroup": q_bank_semi_join_cogroup,
        "stream_distinct_users": q_stream_distinct_users,
        "stream_stateful_hll": q_stream_stateful_hll,
        "countmin_event_type_bounds": q_countmin_event_type_bounds,
        "tdigest_value_quantiles": q_tdigest_value_quantiles,
        "kll_value_quantiles": q_kll_value_quantiles,
        "doc_token_stats": q_doc_token_stats,
        "doc_quality_filter": q_doc_quality_filter,
        "lang_distribution": q_lang_distribution,
        "rolling_fingerprint_stats": q_rolling_fingerprint_stats,
        "exact_dedup_groups": q_exact_dedup_groups,
        "curated_corpus": q_curated_corpus,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash_pairs": q_simhash_pairs,
        "embedding_near_dups": q_embedding_near_dups,
        "cosine_topk": q_cosine_topk,
        "cosine_topk_lsh": q_cosine_topk_lsh,
        "cosine_topk_ivf": q_cosine_topk_ivf,
        "multimodal_features": q_multimodal_features,
        "window_event_counts": q_window_event_counts,
    }


def _all_pairs_jaccard_sql(threshold: float) -> str:
    """Quadratic exact-Jaccard twin over the whole documents table (no
    blocking — feasible at oracle scale, checked against the LSH-verified
    Spark answer)."""
    sh = DD.sql_shingles("text", 5)
    return (
        f"WITH sh AS (SELECT doc_id, {sh} AS grams FROM documents), "
        "ex AS (SELECT doc_id, len(grams) AS n_sh, unnest(grams) AS g FROM sh), "
        "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS shared "
        "FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id "
        "GROUP BY 1, 2, 3, 4) "
        "SELECT id_a, id_b, round(shared::double / (n_a + n_b - shared), 6) "
        "AS jaccard FROM pairs "
        f"WHERE shared::double / (n_a + n_b - shared) >= {threshold} "
        "ORDER BY id_a, id_b"
    )


def oracle_sql() -> dict[str, str]:
    sh = DD.sql_shingles("text", 5)
    return {
        "pages_extract_parity": (
            # pages = documents + re-crawls of every 20th doc (synth_pages)
            "SELECT count(*) + count(*) FILTER (WHERE doc_id % 20 = 0) "
            "AS n_rows, "
            "count(*) + count(*) FILTER (WHERE doc_id % 20 = 0) "
            "AS n_identical, 0::bigint AS n_mismatch FROM documents"
        ),
        "bank_zero_false_negatives": (
            "SELECT count(*) AS n_probes, 0::bigint AS n_missed FROM "
            "(SELECT DISTINCT 'https://' || source || '.example.org/p/' || "
            "doc_id AS url FROM documents)"
        ),
        "bank_semi_join_members": (
            "SELECT o_orderkey FROM orders WHERE o_orderkey IN "
            "(SELECT l_orderkey FROM lineitem) ORDER BY o_orderkey"
        ),
        "bank_anti_join_frontier": (
            # frontier = distinct crawled urls + one fresh url per document;
            # zero false negatives => no crawled url survives the anti join
            "SELECT ((SELECT count(*) FROM (SELECT DISTINCT 'https://' || "
            "source || '.example.org/p/' || doc_id FROM documents)) + "
            "(SELECT count(*) FROM documents))::bigint AS n_frontier, "
            "0::bigint AS n_crawled_surviving, true AS fpp_drop_le_bound"
        ),
        "bank_len_distinct": (
            "SELECT count(DISTINCT l_orderkey) AS total_keys FROM lineitem"
        ),
        "bank_fpp_report": (
            "SELECT 100000::bigint AS n_probes, true AS fpp_le_bound"
        ),
        "bank_merge_associativity": (
            "SELECT 8::bigint AS n_shards, 0::bigint AS n_diff_rows, "
            "true AS associative"
        ),
        "fuse16_membership": (
            "SELECT count(DISTINCT l_partkey) AS n_probes, "
            "0::bigint AS n_missed, true AS space_geometry_exact FROM lineitem"
        ),
        "xor16_membership": (
            "SELECT count(DISTINCT o_custkey) AS n_probes, "
            "0::bigint AS n_missed, true AS space_geometry_exact FROM orders"
        ),
        "fuse8x4_membership": (
            "SELECT count(DISTINCT l_partkey) AS n_probes, "
            "0::bigint AS n_missed, 0::bigint AS n_missed_cogroup, "
            "true AS space_geometry_exact FROM lineitem"
        ),
        "fuse16x4_membership": (
            "SELECT count(DISTINCT o_custkey) AS n_probes, "
            "0::bigint AS n_missed, true AS space_geometry_exact FROM orders"
        ),
        "bank_prefiltered_join": (
            "SELECT p_brand, p_size, count(*)::bigint AS n_rows, "
            "sum(l_quantity)::bigint AS sum_qty, "
            "round(sum(l_extendedprice::DECIMAL(18,2))::double, 4) AS sum_price, "
            "true AS cogroup_path_identical "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE p_size <= 5 AND p_brand = 'Brand#1' "
            "GROUP BY p_brand, p_size ORDER BY p_brand, p_size"
        ),
        "codec_roundtrip": (
            "SELECT 8::bigint AS n_shards, 8::bigint AS n_roundtrip_ok"
        ),
        "tl2_file_roundtrip": (
            "SELECT 4::bigint AS n_files, 4::bigint AS n_match"
        ),
        "cbor_roundtrip": (
            "SELECT 8::bigint AS n_shards, 8::bigint AS n_roundtrip_ok"
        ),
        "bloom_zero_false_negatives": (
            "SELECT count(DISTINCT user_id) AS n_probes, 0::bigint AS n_missed "
            "FROM events"
        ),
        "hll_users_within_bound": (
            "SELECT count(DISTINCT user_id) AS exact_users, "
            "true AS within_bound FROM events"
        ),
        "hll_by_group_bounds": (
            "SELECT event_type, count(DISTINCT user_id) AS n_exact_users, "
            "true AS within_bound FROM events GROUP BY 1 ORDER BY 1"
        ),
        "stream_stateful_hll": (
            "SELECT event_type, count(DISTINCT user_id) AS n_exact_users, "
            "true AS within_bound, true AS multi_batch_state "
            "FROM events GROUP BY 1 ORDER BY 1"
        ),
        "bank_semi_join_cogroup": (
            "SELECT p_partkey FROM part WHERE p_partkey IN "
            "(SELECT l_partkey FROM lineitem) ORDER BY p_partkey"
        ),
        "stream_distinct_users": (
            "SELECT DISTINCT user_id FROM events ORDER BY user_id"
        ),
        "countmin_event_type_bounds": (
            "SELECT event_type, count(*) AS n_events, true AS cm_ok "
            "FROM events GROUP BY event_type"
        ),
        "tdigest_value_quantiles": (
            "SELECT unnest([10, 50, 90, 99])::int AS q_pct, true AS within_bound"
        ),
        "kll_value_quantiles": (
            "SELECT unnest([10, 50, 90, 99])::int AS q_pct, true AS within_bound"
        ),
        "doc_token_stats": (
            f"SELECT doc_id, {TX.sql_token_count('text')} AS n_tokens, "
            f"length(text) AS n_chars_text, "
            f"round({TX.sql_punct_ratio('text')}, 6) AS punct_ratio, "
            f"round({TX.sql_uniq_token_ratio('text')}, 6) AS uniq_ratio "
            "FROM documents ORDER BY doc_id"
        ),
        "doc_quality_filter": (
            f"SELECT doc_id, round({TX.sql_quality_score('text')}, 6) AS quality "
            f"FROM documents WHERE round({TX.sql_quality_score('text')}, 6) >= 0.5 "
            "ORDER BY doc_id"
        ),
        "lang_distribution": (
            f"SELECT {TX.sql_lang_id('text')} AS lang_pred, count(*) AS n_docs "
            "FROM documents GROUP BY 1 ORDER BY 1"
        ),
        "exact_dedup_groups": (
            f"SELECT {TX.sql_fingerprint_md5('text')} AS fingerprint, "
            "min(doc_id) AS keep_id, count(*) AS n_dups "
            "FROM documents GROUP BY 1 ORDER BY 1"
        ),
        "curated_corpus": (
            f"WITH q AS (SELECT doc_id AS id, text, "
            f"round({TX.sql_quality_score('text')}, 6) AS quality "
            f"FROM documents "
            f"WHERE round({TX.sql_quality_score('text')}, 6) >= 0.5), "
            f"ek AS (SELECT id, text, quality FROM "
            f"(SELECT *, row_number() OVER "
            f"(PARTITION BY {TX.sql_fingerprint_md5('text')} ORDER BY id) "
            "AS rn FROM q) WHERE rn = 1), "
            f"sh2 AS (SELECT id, {sh.replace('text', 'text')} AS grams FROM ek), "
            "ex2 AS (SELECT id, len(grams) AS n_sh, unnest(grams) AS g FROM sh2), "
            "prs AS (SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS n_a, "
            "b.n_sh AS n_b, count(*) AS shared FROM ex2 a JOIN ex2 b "
            "ON a.g = b.g AND a.id < b.id GROUP BY 1, 2, 3, 4), "
            "dropped AS (SELECT DISTINCT id_b AS id FROM prs "
            "WHERE shared::double / (n_a + n_b - shared) >= 0.8) "
            f"SELECT id, {TX.sql_token_count('text')} AS n_tokens, quality "
            "FROM ek WHERE id NOT IN (SELECT id FROM dropped) ORDER BY id"
        ),
        "ngram_jaccard_pairs": (
            "WITH sh AS (SELECT doc_id, source, "
            f"{sh} AS grams FROM documents WHERE doc_id < 100), "
            "ex AS (SELECT doc_id, source, len(grams) AS n_sh, unnest(grams) AS g "
            "FROM sh), "
            "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS shared "
            "FROM ex a JOIN ex b ON a.source = b.source AND a.g = b.g "
            "AND a.doc_id < b.doc_id GROUP BY 1, 2, 3, 4) "
            "SELECT id_a, id_b, round(shared::double / (n_a + n_b - shared), 6) "
            "AS jaccard FROM pairs "
            "WHERE shared::double / (n_a + n_b - shared) >= 0.12 "
            "ORDER BY id_a, id_b"
        ),
        "minhash_lsh_pairs": _all_pairs_jaccard_sql(0.35),
        "simhash_pairs": _all_pairs_jaccard_sql(0.6),
        "embedding_near_dups": (
            "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve "
            "FROM embeddings), "
            "p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "list_dot_product(a.ve, b.ve) / "
            "(sqrt(list_dot_product(a.ve, a.ve)) * "
            "sqrt(list_dot_product(b.ve, b.ve))) AS cosine "
            "FROM v a JOIN v b ON a.vec_id < b.vec_id) "
            "SELECT id_a, id_b, round(cosine, 6) AS cosine FROM p "
            "WHERE cosine >= 0.5 ORDER BY id_a, id_b"
        ),
        "cosine_topk_lsh": (
            "WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv "
            "FROM embeddings WHERE vec_id < 10), "
            "c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv "
            "FROM embeddings), "
            "s AS (SELECT query_id, neighbor_id, "
            "list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * "
            "sqrt(list_dot_product(cv, cv))) AS cosine "
            "FROM q, c WHERE neighbor_id <> query_id), "
            "r AS (SELECT query_id, neighbor_id, row_number() OVER "
            "(PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank "
            "FROM s) "
            "SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 5 "
            "ORDER BY query_id, rank"
        ),
        "cosine_topk_ivf": (
            "WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv "
            "FROM embeddings WHERE vec_id < 10), "
            "c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv "
            "FROM embeddings), "
            "s AS (SELECT query_id, neighbor_id, "
            "list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * "
            "sqrt(list_dot_product(cv, cv))) AS cosine "
            "FROM q, c WHERE neighbor_id <> query_id), "
            "r AS (SELECT query_id, neighbor_id, row_number() OVER "
            "(PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank "
            "FROM s) "
            "SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 5 "
            "ORDER BY query_id, rank"
        ),
        "cosine_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv "
            "FROM embeddings WHERE vec_id < 10), "
            "c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv "
            "FROM embeddings), "
            "s AS (SELECT query_id, neighbor_id, "
            "list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * "
            "sqrt(list_dot_product(cv, cv))) AS cosine "
            "FROM q, c WHERE neighbor_id <> query_id), "
            "r AS (SELECT query_id, neighbor_id, row_number() OVER "
            "(PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank "
            "FROM s) "
            "SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 5 "
            "ORDER BY query_id, rank"
        ),
        "multimodal_features": (
            "SELECT doc_id AS media_id, "
            "octet_length(encode(text))::bigint AS n_bytes, "
            "32::int AS feat_dim FROM documents ORDER BY media_id"
        ),
        "window_event_counts": (
            "SELECT epoch(date_trunc('day', ts))::bigint AS window_start_epoch, "
            "count(*) AS n_events FROM events GROUP BY 1 ORDER BY 1"
        ),
        "rolling_fingerprint_stats": (
            "SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS group_rep "
            "FROM documents ORDER BY doc_id"
        ),
    }
