"""Deduplication operators for web-scale corpora.

Five strategies, cheapest first — the standard training-data ladder:

1. ``exact_dedup``            — hash-groupBy on a normalized fingerprint
2. ``ngram_jaccard_pairs``    — *exact* shingle Jaccard via explode+join
3. ``minhash_lsh_pairs``      — MinHash signatures + LSH banding (approximate,
                                 scales to 10^12 docs: candidate generation is
                                 a band-bucket equi-join, never O(n^2))
4. ``simhash_pairs``          — 64-bit SimHash + hamming-ball blocking
5. ``embedding_near_dups``    — cosine near-dup over an embedding column

Design notes for 10^12 docs / 1000 executors:

- Signatures are computed in one Arrow-vectorized pass (``mapInPandas`` /
  pandas UDF) — one narrow map over the corpus, no per-row Python.
- All pair generation goes through equi-joins on bucket keys (band hash,
  simhash block, LSH bucket) so Catalyst plans shuffle-hash joins keyed on
  the bucket — never a cartesian product.  Hot buckets (boilerplate shingles)
  are capped via a per-bucket limit to bound skew.
- The same MinHash permutation seeds are fixed constants → deterministic and
  resumable; mirrors the reference's fixed seed discipline
  (/root/reference/src/fuse8.rs:331).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import fingerprint_md5
from ..hashing import murmur64

# ---------------------------------------------------------------------------
# 1. exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by normalized-text fingerprint.

    One hash-partial + final aggregate (Catalyst map-side combine); at scale
    the shuffle carries (fingerprint, id) pairs only.  Returns
    (fingerprint, keep_id, n_dups) with keep_id = min id per group.
    """
    return (
        df.select(fingerprint_md5(text_col).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
    )


def exact_dedup_keep(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The deduplicated corpus: first row (min id) per fingerprint group."""
    w = Window.partitionBy(fingerprint_md5(text_col)).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# shingles (shared by exact-jaccard and minhash)
# ---------------------------------------------------------------------------

def shingles(text: Column | str, k: int = 5) -> Column:
    """Distinct character k-shingles of the lowercased text (array<string>).

    Pure Catalyst: sequence + transform + substring — JVM codegen, no UDF.
    """
    c = F.col(text) if isinstance(text, str) else text
    low = F.lower(c)
    n = F.length(low) - F.lit(k - 1)
    return F.array_distinct(
        F.when(
            n > 0,
            F.transform(
                F.sequence(F.lit(1), n), lambda i: F.substring(low, i, k)
            ),
        ).otherwise(F.array(low))
    )


def sql_shingles(col: str, k: int = 5) -> str:
    """DuckDB twin of ``shingles`` (list comprehension over generate range)."""
    return (
        f"list_distinct(CASE WHEN length({col}) >= {k} THEN "
        f"[substr(lower({col}), i, {k}) for i in range(1, length({col}) - {k} + 2)] "
        f"ELSE [lower({col})] END)"
    )


# ---------------------------------------------------------------------------
# 2. exact n-gram Jaccard (distributed, explode + equi-join)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.8,
    max_bucket: int = 1000,
    block_col: str | None = None,
) -> DataFrame:
    """Exact Jaccard over character k-shingles for all candidate pairs.

    Plan shape (scales because no cartesian product ever forms):
    explode shingles → equi-join on shingle (co-occurring docs only) →
    count shared shingles per pair → jaccard = shared / (|A|+|B|-shared).
    ``max_bucket`` drops degenerate shingles shared by more than that many
    docs (boilerplate) — the skew cap; dropped shingles are the stop-shingle
    analog of stopwords and shrink |A∩B| and |A∪B| symmetrically only when
    a pair co-occurs there, an accepted approximation at web scale (we keep
    it exact here by capping, not sampling: sf-scale buckets never hit it).

    Optional ``block_col`` restricts comparisons to rows sharing that column
    (e.g. the crawl source/domain) — the classic blocking key that bounds
    bucket sizes at web scale and gives the DuckDB oracle the same exact
    semantics at sf scale.
    """
    blocks = [block_col] if block_col else []
    sh = df.select(
        F.col(id_col).alias("id"), *blocks, shingles(text_col, k).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    exploded = sh.select("id", *blocks, "n_sh", F.explode("sh").alias("g"))
    join_keys = blocks + ["g"]
    bucket_sizes = exploded.groupBy(*join_keys).agg(F.count("*").alias("bn"))
    exploded = exploded.join(
        F.broadcast(bucket_sizes.where(F.col("bn") <= max_bucket).select(*join_keys)),
        join_keys,
    )
    a = exploded.select(
        F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), *join_keys
    )
    b = exploded.select(
        F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), *join_keys
    )
    pairs = (
        a.join(b, join_keys)
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("shared"))
    )
    return pairs.select(
        "id_a",
        "id_b",
        (
            F.col("shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("shared"))
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# 3. MinHash + LSH banding
# ---------------------------------------------------------------------------

_MINHASH_SEED = np.uint64(0x9E3779B97F4A7C15)


def _perm_constants(n_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) multiply-shift permutation constants."""
    rng = np.random.default_rng(42)
    a = rng.integers(1, 1 << 61, size=n_hashes, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 61, size=n_hashes, dtype=np.uint64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 128,
    k: int = 5,
) -> DataFrame:
    """(id, signature array<long>) — one Arrow pass, numpy inner math.

    Shingle hashing uses the same murmur64 finalizer as the filter kernels
    (/root/reference/src/xor8/filter.rs:36-43) so the whole library shares
    one hash family.
    """
    a_const, b_const = _perm_constants(n_hashes)
    sh = df.select(F.col(id_col).alias("id"), shingles(text_col, k).alias("sh"))
    schema = T.StructType(
        [
            T.StructField("id", sh.schema["id"].dataType, False),
            T.StructField("signature", T.ArrayType(T.LongType()), False),
        ]
    )

    def compute(batches):
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, sh_list in zip(pdf["id"], pdf["sh"]):
                ids.append(doc_id)
                if sh_list is None or len(sh_list) == 0:
                    sigs.append(np.full(n_hashes, -1, dtype=np.int64))
                    continue
                # process-stable shingle hashes (never PYTHONHASHSEED)
                hv = murmur64(
                    np.array(
                        [_stable_str_hash(s) for s in sh_list], dtype=np.uint64
                    )
                )
                with np.errstate(over="ignore"):
                    # (a*x + b) per permutation, min over shingles
                    m = (hv[None, :] * a_const[:, None] + b_const[:, None]).min(axis=1)
                sigs.append(m.astype(np.int64))
            yield pd.DataFrame({"id": ids, "signature": [list(s) for s in sigs]})

    return sh.mapInPandas(compute, schema)


def _stable_str_hash(s: str) -> int:
    """Process-stable 64-bit string hash (blake2b, C-speed — never
    PYTHONHASHSEED-dependent)."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 128,
    bands: int = 32,
    k: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate candidate pairs via LSH banding + signature verify.

    rows-per-band = n_hashes/bands; a pair collides in a band iff that whole
    band of the signature matches → P(candidate) ≈ 1-(1-j^r)^b.  Candidate
    generation is an equi-join on (band, band_hash) — shuffle keyed on
    buckets, no cartesian.  Estimated jaccard = matching signature fraction.
    """
    if n_hashes % bands:
        raise ValueError("bands must divide n_hashes")
    r = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, k)
    banded = sig.select(
        "id",
        "signature",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(F.slice("signature", i * r + 1, r)),
            )
        ).alias("band", "band_hash"),
    )
    a = banded.select(
        F.col("id").alias("id_a"), F.col("signature").alias("sig_a"), "band", "band_hash"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("signature").alias("sig_b"), "band", "band_hash"
    )
    cand = (
        a.join(b, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda m: m,
        )
    ).cast("double") / F.lit(n_hashes)
    return cand.select("id_a", "id_b", est.alias("est_jaccard")).where(
        F.col("est_jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# 4. SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """(id, simhash long): 64-bit SimHash over character k-shingles."""
    sh = df.select(F.col(id_col).alias("id"), shingles(text_col, k).alias("sh"))
    schema = T.StructType(
        [
            T.StructField("id", sh.schema["id"].dataType, False),
            T.StructField("simhash", T.LongType(), False),
        ]
    )

    def compute(batches):
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            ids, out = [], []
            for doc_id, sh_list in zip(pdf["id"], pdf["sh"]):
                ids.append(doc_id)
                if sh_list is None or len(sh_list) == 0:
                    out.append(0)
                    continue
                hv = murmur64(
                    np.array([_stable_str_hash(s) for s in sh_list], dtype=np.uint64)
                )
                bits = (hv[:, None] >> bit_idx[None, :]) & np.uint64(1)
                # signed arithmetic: uint64 would underflow for minority bits
                votes = bits.sum(axis=0).astype(np.int64) * 2 - len(sh_list)
                sim = int(((votes > 0).astype(np.uint64) << bit_idx).sum(dtype=np.uint64))
                out.append(sim - (1 << 64) if sim >= (1 << 63) else sim)
            yield pd.DataFrame({"id": ids, "simhash": out})

    return sh.mapInPandas(compute, schema)


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    k: int = 5,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole blocking: split the 64-bit simhash into ``blocks`` chunks; any
    pair within hamming d < blocks must agree on >=1 chunk → equi-join per
    chunk, verify hamming exactly with bit_count(xor).  Standard web-dedup
    trick (Manku et al., WWW'07) — no cartesian product.
    """
    sig = simhash_signatures(df, id_col, text_col, k)
    width = 64 // blocks
    chunks = sig.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sim_a"), "chunk_idx", "chunk"
    )
    b = chunks.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sim_b"), "chunk_idx", "chunk"
    )
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# 5. embedding cosine near-dups
# ---------------------------------------------------------------------------

def _cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float> columns in double precision —
    pure Catalyst (zip_with + aggregate), JVM codegen, no UDF."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (na * nb)


def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 8,
) -> DataFrame:
    """Pairs with cosine >= threshold, blocked by random-hyperplane LSH.

    Sign-LSH: bucket = sign bits of ``n_planes`` fixed random projections;
    pairs at cosine >= .95 collide with high probability (angle <= 18°,
    P(per-plane agree) ≈ .90).  Equi-join on bucket — no cartesian.  For
    recall-critical use, union over ``rotations`` of the plane set.
    """
    from .similarity import hyperplane_bucket_col

    bucketed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        hyperplane_bucket_col(F.col(vec_col), n_planes).alias("bucket"),
    )
    a = bucketed.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "bucket"
    )
    b = bucketed.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _cosine(F.col("vec_a"), F.col("vec_b")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
