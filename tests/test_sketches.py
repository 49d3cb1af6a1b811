"""Sketch suite tests: accuracy within published error bounds, merge
associativity / order-independence, codec round-trips, and distributed
(Spark) equivalence with local computation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xorfilter_spark.sketches.bloom import Bloom, bloom_build
from xorfilter_spark.sketches.countmin import CountMin, countmin_build
from xorfilter_spark.sketches.hll import HLL, hll_count_distinct, hll_count_distinct_by
from xorfilter_spark.sketches.kll import KLL, kll_build
from xorfilter_spark.sketches.tdigest import TDigest, tdigest_build

RNG = np.random.default_rng(123)


# ---------------------------------------------------------------------------
# local accuracy + merge laws
# ---------------------------------------------------------------------------

def test_hll_accuracy_and_merge():
    n = 200_000
    vals = RNG.integers(0, 2**64, size=n, dtype=np.uint64)
    h = HLL(p=14)
    h.update(vals)
    est = h.estimate()
    true = np.unique(vals).size
    assert abs(est - true) / true < 3 * 1.04 / np.sqrt(2**14)

    # merge == single pass (registers are max-merged)
    parts = np.array_split(vals, 7)
    accs = [HLL(14) for _ in parts]
    for a, p in zip(accs, parts):
        a.update(p)
    m = accs[0]
    for a in accs[1:]:
        m.merge(a)
    assert np.array_equal(m.registers, h.registers)

    # codec round-trip
    assert np.array_equal(HLL.from_bytes(h.to_bytes()).registers, h.registers)


def test_hll_small_range_linear_counting():
    h = HLL(p=12)
    vals = RNG.integers(0, 2**64, size=50, dtype=np.uint64)
    h.update(vals)
    assert abs(h.estimate() - 50) < 5


def test_bloom_membership_and_fpp():
    keys = RNG.integers(0, 2**63, size=50_000, dtype=np.uint64)  # bloom uses low/high words, range is fine
    b = Bloom(capacity=50_000, fpp=0.01)
    b.update(keys)
    assert b.contains(keys).all()
    probes = RNG.integers(2**63, 2**64, size=100_000, dtype=np.uint64)
    assert b.contains(probes).mean() < 0.02
    # OR-merge
    b1, b2 = Bloom(50_000, 0.01), Bloom(50_000, 0.01)
    b1.update(keys[:25_000])
    b2.update(keys[25_000:])
    b1.merge(b2)
    assert np.array_equal(b1.bits, b.bits)
    assert np.array_equal(Bloom.from_bytes(b.to_bytes()).bits, b.bits)


def test_countmin_bounds():
    # zipf-ish frequencies
    items = RNG.zipf(1.5, size=200_000) % 10_000
    c = CountMin(width=16384, depth=5)
    c.update(items.astype(np.uint64))
    uniq, true = np.unique(items, return_counts=True)
    est = c.query(uniq.astype(np.uint64))
    assert (est >= true).all()  # never undershoots
    eps = np.e / 16384
    assert ((est - true) <= eps * items.size * 3).all()
    # add-merge
    c1, c2 = CountMin(16384, 5), CountMin(16384, 5)
    c1.update(items[:100_000].astype(np.uint64))
    c2.update(items[100_000:].astype(np.uint64))
    c1.merge(c2)
    assert np.array_equal(c1.table, c.table)
    assert np.array_equal(CountMin.from_bytes(c.to_bytes()).table, c.table)


@pytest.mark.parametrize("dist", ["uniform", "lognormal"])
def test_tdigest_quantiles(dist):
    n = 300_000
    vals = RNG.random(n) if dist == "uniform" else RNG.lognormal(0, 2, n)
    t = TDigest(delta=100)
    for chunk in np.array_split(vals, 13):
        t.update(chunk)
    svals = np.sort(vals)
    for q in [0.001, 0.01, 0.25, 0.5, 0.75, 0.99, 0.999]:
        est = t.quantile(q)
        # rank error: where does the estimate fall in the true data?
        rank = np.searchsorted(svals, est) / n
        tail = min(q, 1 - q)
        tol = max(0.005, tail * 0.35) if tail < 0.05 else 0.02
        assert abs(rank - q) < tol, (q, rank)

    # merge gives similar quantiles
    t1, t2 = TDigest(100), TDigest(100)
    t1.update(vals[: n // 2])
    t2.update(vals[n // 2 :])
    t1.merge(t2)
    for q in [0.01, 0.5, 0.99]:
        r = np.searchsorted(svals, t1.quantile(q)) / n
        assert abs(r - q) < 0.03
    rt = TDigest.from_bytes(t.to_bytes())
    assert rt.quantile(0.5) == t.quantile(0.5)


def test_kll_rank_error():
    n = 300_000
    vals = RNG.normal(size=n)
    k = KLL(k=200)
    for chunk in np.array_split(vals, 11):
        k.update(chunk)
    svals = np.sort(vals)
    for q in [0.01, 0.1, 0.5, 0.9, 0.99]:
        est = k.quantile(q)
        rank = np.searchsorted(svals, est) / n
        assert abs(rank - q) < 0.025, (q, rank)
    # merge
    k1, k2 = KLL(200), KLL(200)
    k1.update(vals[: n // 2])
    k2.update(vals[n // 2 :])
    k1.merge(k2)
    r = np.searchsorted(svals, k1.quantile(0.5)) / n
    assert abs(r - 0.5) < 0.03
    rt = KLL.from_bytes(k.to_bytes())
    assert rt.quantile(0.5) == k.quantile(0.5)
    assert rt.n == k.n


def test_kll_deterministic():
    vals = RNG.normal(size=50_000)
    a, b = KLL(200), KLL(200)
    a.update(vals)
    b.update(vals)
    assert a.to_bytes() == b.to_bytes()


# ---------------------------------------------------------------------------
# distributed paths
# ---------------------------------------------------------------------------

def test_spark_hll_matches_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    est = hll_count_distinct(li, "l_orderkey", p=14)
    true = li.select("l_orderkey").distinct().count()
    assert abs(est - true) / true < 0.05


def test_spark_hll_by_group(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = hll_count_distinct_by(docs, ["lang"], "doc_id", p=12).collect()
    true = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.countDistinct("doc_id").alias("n")).collect()}
    assert len(out) == len(true)
    for r in out:
        assert abs(r["approx_distinct"] - true[r["lang"]]) / true[r["lang"]] < 0.1


def test_spark_tdigest_vs_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    t = tdigest_build(li, "l_extendedprice")
    exact = li.approxQuantile("l_extendedprice", [0.5], 0.0001)[0]
    n = li.count()
    # compare by rank, not value
    med = t.quantile(0.5)
    rank = li.where(F.col("l_extendedprice") <= med).count() / n
    assert abs(rank - 0.5) < 0.03


def test_spark_kll_vs_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    k = kll_build(li, "l_quantity")
    n = li.count()
    q9 = k.quantile(0.9)
    rank = li.where(F.col("l_quantity") <= q9).count() / n
    assert abs(rank - 0.9) < 0.05


def test_spark_bloom_and_countmin(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    b = bloom_build(li, "l_orderkey", capacity=10_000, fpp=0.01)
    assert b.fill_ratio() > 0
    c = countmin_build(li, "l_returnflag", width=1024, depth=5)
    assert c.total == li.count()


def test_tree_reduce_spreads_groups(spark):
    """merge_state_df beyond tree_threshold states must spread the merge
    across threshold groups (ADVICE r2: monotonically_increasing_id-based
    grouping collapsed every state into ONE merge task) and still produce
    the exact same estimate as a flat merge."""
    from xorfilter_spark.sketches.core import merge_state_df, partition_states
    from xorfilter_spark.sketches.hll import HLL

    df = spark.range(40_000).repartition(16).selectExpr("id as k")
    states = partition_states(df, "k", lambda: HLL(12))
    assert states.count() == 16
    tree = merge_state_df(states, HLL, tree_threshold=4)
    flat = merge_state_df(partition_states(df, "k", lambda: HLL(12)), HLL,
                          tree_threshold=1024)
    assert tree.estimate() == flat.estimate()  # merge is exact on registers
    assert abs(tree.estimate() - 40_000) / 40_000 < 0.1


def test_merge_associativity_all_sketches():
    """The north rule's merge law, stated directly: folding partial states
    in ANY association order / permutation yields (a) byte-identical state
    for the idempotent-register sketches (HLL max, Bloom or, count-min add)
    and (b) bound-respecting estimates for the compaction sketches
    (t-digest, KLL), whose internal layout is order-dependent by design
    but whose answers must not be."""
    from xorfilter_spark.sketches.bloom import Bloom
    from xorfilter_spark.sketches.countmin import CountMin
    from xorfilter_spark.sketches.kll import KLL
    from xorfilter_spark.sketches.tdigest import TDigest

    vals = RNG.integers(0, 2**63, size=90_000, dtype=np.uint64)
    parts = np.array_split(vals, 6)

    def fold(make, order, update_f=None):
        accs = []
        for p in [parts[i] for i in order]:
            a = make()
            (update_f or (lambda a, p: a.update(p)))(a, p)
            accs.append(a)
        m = accs[0]
        for a in accs[1:]:
            m.merge(a)
        return m

    orders = [list(range(6)), [5, 4, 3, 2, 1, 0], [2, 0, 4, 1, 5, 3]]

    # byte-exact family
    for make, state in (
        (lambda: HLL(12), lambda s: s.registers),
        (lambda: Bloom(100_000, 0.01), lambda s: s.bits),
        (lambda: CountMin(4096, 5), lambda s: s.table),
    ):
        ref = state(fold(make, orders[0]))
        for o in orders[1:]:
            assert np.array_equal(state(fold(make, o)), ref), o

    # bound-respecting family: quantile answers from every order agree
    # with exact ranks within the sketch's tolerance
    fvals = vals.astype(np.float64)
    exact = np.quantile(fvals, [0.1, 0.5, 0.9])
    span = fvals.max() - fvals.min()
    for make in (lambda: TDigest(200), lambda: KLL(200)):
        for o in orders:
            m = fold(make, o, lambda a, p: a.update(p.astype(np.float64)))
            got = np.array(m.quantiles([0.1, 0.5, 0.9]))
            # rank-error tolerance ~2% of range for uniform data
            assert np.all(np.abs(got - exact) <= 0.02 * span), (o, got, exact)
