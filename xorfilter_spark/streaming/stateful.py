"""Custom stateful streaming operators via ``applyInPandasWithState``.

The built-in streaming surface covers windowed aggregates
(`incremental.streaming_sketch_counts`) and exact dedup
(`incremental.streaming_distinct`); this module adds the *custom
user-state* tier: a per-group sketch that lives in the streaming state
store, is updated with Arrow-vectorized batches, and emits a refreshed
estimate every micro-batch.

The flagship is a per-group HyperLogLog: state = the serialized register
array (fixed 2^p bytes per group, independent of stream length), update =
the same vectorized numpy register-max as the batch sketch
(sketches/hll.py), so a streaming estimate after any prefix of
micro-batches equals the batch estimate over the union of those batches
(HLL merge is commutative/idempotent — batch-split invariant).

Scale notes (10^12 events): state is keyed by group, so the state store
holds |groups| x 2^p bytes regardless of event count; each micro-batch
shuffles only (group, digest) pairs to the state partitions; digests are
computed JVM-side (xxhash64) so Python sees 8 bytes/event.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sketches.hll import HLL

_DIGEST = "__digest"


def stateful_hll_by_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    p: int = 12,
) -> DataFrame:
    """Streaming per-group approximate-distinct with explicit user state.

    Returns a streaming DataFrame (outputMode must be ``update``) of
    ``(group_col, approx_distinct double, updates long)`` where
    ``approx_distinct`` is the HLL estimate over every key seen for that
    group since the query started and ``updates`` counts the micro-batches
    that touched the group (state-carried lineage, mirroring the bank's
    per-shard lineage columns).

    On a BATCH DataFrame this falls back to the batch per-group sketch
    (sketches/hll.py `hll_count_distinct_by`) with identical estimates —
    which is how the oracle checks it; the streaming path is exercised by
    tests/test_streaming.py with a multi-file replay.
    """
    group_type = df.schema[group_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(group_col, group_type, False),
            T.StructField("approx_distinct", T.DoubleType(), False),
            T.StructField("updates", T.LongType(), False),
        ]
    )
    if not df.isStreaming:
        # same null gate as the streaming projection below, so the two
        # faces build identical register sets (batch-split invariance)
        batch = hll_by_group_batch(
            df.where(F.col(key_col).isNotNull()), group_col, key_col, p
        )
        return batch.select(
            F.col(group_col),
            F.col("approx_distinct"),
            F.lit(1).cast("long").alias("updates"),
        )

    state_schema = T.StructType(
        [
            T.StructField("hll", T.BinaryType(), True),
            T.StructField("updates", T.LongType(), True),
        ]
    )

    def update_fn(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            buf, updates = state.get
            acc = HLL.from_bytes(bytes(buf))
        else:
            acc, updates = HLL(p), 0
        for pdf in pdfs:
            d = pdf[_DIGEST].dropna().to_numpy(dtype=np.int64)
            if d.size:
                acc.update(d.astype(np.uint64))
        updates += 1
        state.update((acc.to_bytes(), updates))
        yield pd.DataFrame(
            {
                group_col: [key[0]],
                "approx_distinct": [float(acc.estimate())],
                "updates": [int(updates)],
            }
        )

    keyed = df.select(
        F.col(group_col), F.xxhash64(F.col(key_col)).alias(_DIGEST)
    ).where(F.col(key_col).isNotNull())
    return keyed.groupBy(group_col).applyInPandasWithState(
        update_fn,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def hll_by_group_batch(
    df: DataFrame, group_col: str, key_col: str, p: int = 12
) -> DataFrame:
    """Batch twin with the same digesting + registers as the state path."""
    from ..sketches.hll import hll_count_distinct_by

    return hll_count_distinct_by(df, [group_col], key_col, p=p)
