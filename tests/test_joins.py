"""prefilter_join: exact-result equivalence with the plain join (zero
false negatives guarantee it; the exact join removes FPP leakage), bank
reuse across joins, and the left_semi form."""

import pytest
from pyspark.sql import functions as F

from xorfilter_spark import bank as xb
from xorfilter_spark.operators.joins import prefilter_join


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    small = part.where((F.col("p_size") <= 5) & (F.col("p_brand") == "Brand#1"))
    return lineitem, small


def _sorted_rows(df, cols):
    return df.select(*cols).orderBy(*cols).collect()


def test_inner_matches_plain_join(tables):
    lineitem, small = tables
    cols = ["l_orderkey", "l_linenumber", "l_partkey", "p_size"]
    plain = lineitem.join(small, lineitem["l_partkey"] == small["p_partkey"])
    pre = prefilter_join(lineitem, small, "l_partkey", "p_partkey")
    assert _sorted_rows(pre, cols) == _sorted_rows(plain, cols)


def test_left_semi_matches_plain(tables):
    lineitem, small = tables
    cols = ["l_orderkey", "l_linenumber", "l_partkey"]
    plain = lineitem.join(
        small, lineitem["l_partkey"] == small["p_partkey"], "left_semi"
    )
    pre = prefilter_join(lineitem, small, "l_partkey", "p_partkey", how="left_semi")
    assert _sorted_rows(pre, cols) == _sorted_rows(plain, cols)


def test_prebuilt_bank_reuse(tables):
    lineitem, small = tables
    bank = xb.build_bank(small, "p_partkey", variant="fuse16", num_shards=2)
    a = prefilter_join(lineitem, small, "l_partkey", "p_partkey", bank=bank)
    b = prefilter_join(lineitem, small, "l_partkey", "p_partkey")
    cols = ["l_orderkey", "l_linenumber", "l_partkey"]
    assert _sorted_rows(a, cols) == _sorted_rows(b, cols)


def test_composite_key_matches_plain_join(spark, sf_dir):
    """Composite (l_orderkey, l_linenumber) key: the bank digests the
    tuple through one xxhash64; result must equal the plain two-column
    equi-join."""
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    small = lineitem.select("l_orderkey", "l_linenumber", "l_quantity").where(
        F.col("l_orderkey") % 97 == 0
    ).withColumnRenamed("l_orderkey", "r_orderkey").withColumnRenamed(
        "l_linenumber", "r_linenumber"
    )
    cols = ["l_orderkey", "l_linenumber", "l_partkey"]
    plain = lineitem.join(
        small,
        (lineitem["l_orderkey"] == small["r_orderkey"])
        & (lineitem["l_linenumber"] == small["r_linenumber"]),
    )
    pre = prefilter_join(
        lineitem,
        small,
        ["l_orderkey", "l_linenumber"],
        ["r_orderkey", "r_linenumber"],
    )
    assert _sorted_rows(pre, cols) == _sorted_rows(plain, cols)


def test_outer_join_rejected(tables):
    lineitem, small = tables
    with pytest.raises(ValueError, match="inner"):
        prefilter_join(lineitem, small, "l_partkey", "p_partkey", how="left")


def test_prune_is_narrow_map_before_join(tables):
    """The bank probe must appear as a zero-shuffle ArrowEvalPython below
    the join in the physical plan — i.e. the prune happens BEFORE the
    join's exchange, which is the entire point at 100 TB."""
    lineitem, small = tables
    pre = prefilter_join(lineitem, small, "l_partkey", "p_partkey")
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    # the probe side's filter sits under the join, not above it
    assert plan.index("ArrowEvalPython") > plan.index("Join")


def test_cogroup_probe_matches_plain_join(tables):
    """probe='cogroup' (the beyond-broadcast dimension-bank path) must be
    row-identical to both the plain join and the broadcast-probe form."""
    lineitem, small = tables
    cols = ["l_orderkey", "l_linenumber", "l_partkey", "p_size"]
    plain = lineitem.join(small, lineitem["l_partkey"] == small["p_partkey"])
    pre = prefilter_join(
        lineitem, small, "l_partkey", "p_partkey", probe="cogroup"
    )
    assert _sorted_rows(pre, cols) == _sorted_rows(plain, cols)
