"""End-to-end training-data curation: the composition every LLM-data team
runs, as one oracle-checkable operator.

    raw corpus
      -> quality gate        (functions.text.quality_score, pure Catalyst)
      -> exact dedup         (min-id per normalized fingerprint)
      -> near-dup removal    (MinHash-LSH candidates, EXACT Jaccard verdicts;
                              drop any doc with a >=threshold twin of lower id)
      -> per-doc stats       (tokens, quality)

Every stage is deterministic, so the whole pipeline has a quadratic DuckDB
twin (the near-dup stage equals the all-pairs rule whenever LSH recall is 1
— the same verified-candidates contract as operators.dedup).

Scale shape: quality gate and stats are narrow codegen maps; exact dedup is
one partial+final aggregate; near-dup is the bucketed LSH equi-join ladder
(never O(n^2)); the final anti-join against dropped ids broadcasts the
(tiny) drop list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .functions import text as TX
from .operators import dedup as DD


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.5,
    jaccard_threshold: float = 0.8,
    n_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Curated corpus: (id, n_tokens, quality) for every surviving doc.

    Survival rules (deterministic, SQL-twinnable):
    1. ``quality_score(text)`` rounded to 6 digits >= ``quality_min``
    2. the doc has the MINIMUM id among exact duplicates (normalized-text
       fingerprint)
    3. no surviving doc with a smaller id has exact shingle Jaccard >=
       ``jaccard_threshold`` with it (near-dup rule; candidates via
       MinHash-LSH banding, verdicts via exact Jaccard)
    """
    quality = F.round(TX.quality_score(text_col), 6)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        quality.alias("quality"),
    ).where(F.col("quality") >= quality_min)

    w = Window.partitionBy(TX.fingerprint_md5("text")).orderBy("id")
    exact_kept = (
        base.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )

    pairs = DD.minhash_lsh_verified_pairs(
        exact_kept, "id", "text",
        n_hashes=n_hashes, bands=bands, threshold=jaccard_threshold,
    )
    # id_a < id_b by construction: every id_b has a lower-id near-twin
    dropped = pairs.select(F.col("id_b").alias("id")).distinct()
    survivors = exact_kept.join(F.broadcast(dropped), "id", "left_anti")

    return survivors.select(
        "id",
        TX.token_count("text").alias("n_tokens"),
        "quality",
    )
