"""Mergeable-sketch plumbing: the Spark execution pattern shared by every
sketch (HLL, Bloom, count-min, t-digest, KLL) and by the filter bank.

The reference's Builder type is "a partial aggregate state" (SURVEY.md §1);
this module generalizes it: a sketch is a value with

    update(np.ndarray) -> None        # absorb a vector of inputs
    merge(other) -> None              # associative, commutative
    to_bytes() / from_bytes(buf)      # stable binary codec

and two Spark drivers:

- ``partition_states(df, col, make)``: one partial state per *input
  partition* via ``mapInPandas`` — map-side combine with NO shuffle of raw
  rows; only tiny states leave the executors.
- ``agg_by(df, group_cols, col, make)``: per-group sketches as a two-phase
  mergeable UDAF — phase 1 computes per-(partition, group) partial states
  inside ``mapInPandas`` (map-side combine), phase 2 shuffles *states only*
  and merges them per group in ``applyInPandas``.  At 10^12 rows the
  shuffle volume is O(groups x state_size), independent of row count.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType([T.StructField("state", T.BinaryType(), False)])


def digest_expr(col: str):
    """JVM-side 64-bit digest for arbitrary input types (stays in codegen)."""
    return F.xxhash64(F.col(col))


def partition_states(df: DataFrame, col: str, make: Callable, hash_input: bool = True) -> DataFrame:
    """One partial sketch state per partition; no raw-row shuffle."""
    src = df.select(digest_expr(col).alias("__v")) if hash_input else df.select(
        F.col(col).cast("double").alias("__v")
    )

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = make()
        for pdf in batches:
            v = pdf["__v"].dropna().to_numpy()
            if v.size:
                acc.update(v)
        yield pd.DataFrame({"state": [acc.to_bytes()]})

    return src.mapInPandas(it, STATE_SCHEMA)


def merge_state_df(states_df: DataFrame, cls, tree_threshold: int = 1024) -> object:
    """Fold of the (tiny) per-partition states into one sketch object.

    Driver-side while the state count is small (one state per input
    partition; KBs each).  Beyond ``tree_threshold`` states a distributed
    tree-reduce layer first merges ``tree_threshold``-sized groups
    executor-side, so a 10^6-partition input never ships 10^6 states to
    the driver — the merge is associative+commutative, so layering is safe.
    """
    n = states_df.count()
    while n > tree_threshold:
        # group on spark_partition_id: states_df carries one state per
        # partition, so this spreads the N states across tree_threshold
        # merge tasks.  (monotonically_increasing_id() was degenerate here:
        # its value is partitionId<<33, and (pid<<33) % threshold == 0 for
        # every row whenever threshold divides 2^33 — ALL states collapsed
        # into one merge task; ADVICE r2.)
        grouped = states_df.withColumn(
            "__g", F.pmod(F.spark_partition_id(), F.lit(int(tree_threshold)))
        )

        def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
            acc = cls.from_bytes(bytes(pdf["state"].iloc[0]))
            for b in pdf["state"].iloc[1:]:
                acc.merge(cls.from_bytes(bytes(b)))
            return pd.DataFrame({"state": [acc.to_bytes()]})

        states_df = grouped.groupBy("__g").applyInPandas(merge_group, STATE_SCHEMA)
        n = states_df.count()
    rows = states_df.collect()
    acc = cls.from_bytes(bytes(rows[0]["state"]))
    for r in rows[1:]:
        acc.merge(cls.from_bytes(bytes(r["state"])))
    return acc


def sketch(df: DataFrame, col: str, make: Callable, cls, hash_input: bool = True):
    """End-to-end: partial states per partition -> merged sketch object."""
    return merge_state_df(partition_states(df, col, make, hash_input), cls)


def agg_by(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    make: Callable,
    cls,
    finish: Callable[[object], dict],
    finish_schema: list[T.StructField],
    hash_input: bool = True,
) -> DataFrame:
    """Per-group sketch aggregation as a two-phase mergeable UDAF."""
    vcol = digest_expr(col).alias("__v") if hash_input else F.col(col).cast("double").alias("__v")
    src = df.select(*group_cols, vcol)

    phase1_schema = T.StructType(
        [src.schema[c] for c in group_cols] + [T.StructField("state", T.BinaryType(), False)]
    )

    def phase1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        accs: dict = {}
        keys_seen: dict = {}
        for pdf in batches:
            for key, grp in pdf.groupby(group_cols, dropna=False, sort=False):
                k = key if isinstance(key, tuple) else (key,)
                acc = accs.get(k)
                if acc is None:
                    acc = accs[k] = make()
                    keys_seen[k] = k
                v = grp["__v"].dropna().to_numpy()
                if v.size:
                    acc.update(v)
        if accs:
            out = pd.DataFrame(
                [dict(zip(group_cols, k)) | {"state": a.to_bytes()} for k, a in accs.items()]
            )
            yield out[[*group_cols, "state"]]

    partials = src.mapInPandas(phase1, phase1_schema)

    out_schema = T.StructType([src.schema[c] for c in group_cols] + list(finish_schema))

    def phase2(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = cls.from_bytes(bytes(pdf["state"].iloc[0]))
        for b in pdf["state"].iloc[1:]:
            acc.merge(cls.from_bytes(bytes(b)))
        row = {c: pdf[c].iloc[0] for c in group_cols}
        row.update(finish(acc))
        return pd.DataFrame([row])

    return partials.groupBy(*group_cols).applyInPandas(phase2, out_schema)
