"""Text-analysis column functions for web-scale training-data pipelines.

Everything here is a pure Catalyst column expression (JVM-side, whole-stage
codegen — no Python in the hot path) except the rolling-hash fingerprint,
which is an Arrow-vectorized pandas UDF.  Each expression is written so an
exact ANSI-SQL twin exists for the DuckDB oracle in ``__spark_entry__.py``.

These generalize the reference's key-preparation stage: the reference
reduces every key to a u64 digest before indexing
(/root/reference/src/xor8/builder.rs:77-81); a web-text pipeline reduces
every *document* to digests (fingerprints), language labels, and quality
scores before dedup/filtering at 10^12-document scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# small fixed stopword profiles — deterministic language-ID heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "und", "das", "ein", "ist"],
    "es": ["el", "la", "de", "que", "los", "es"],
    "fr": ["le", "la", "et", "les", "des", "est"],
}
LANG_ORDER = ["en", "de", "es", "fr"]  # tie-break: first wins

PUNCT_CLASS = r"[.,!?;:]"


def tokens(col: Column | str) -> Column:
    """Non-empty whitespace-separated tokens (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda x: x != F.lit(""))


def token_count(col: Column | str) -> Column:
    """Whitespace token count (the cheap pre-BPE budget estimator)."""
    return F.size(tokens(col))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are sentence punctuation."""
    c = F.col(col) if isinstance(col, str) else col
    removed = F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return F.when(F.length(c) > 0, removed.cast("double") / F.length(c)).otherwise(
        F.lit(0.0)
    )


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    words = STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(col), lambda x: F.array_contains(arr, F.lower(x))))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    n = token_count(col)
    return F.when(n > 0, stopword_hits(col, lang).cast("double") / n).otherwise(
        F.lit(0.0)
    )


def uniq_token_ratio(col: Column | str) -> Column:
    """Distinct-token fraction — low values flag boilerplate/spam repetition."""
    t = tokens(col)
    return F.when(
        F.size(t) > 0, F.size(F.array_distinct(t)).cast("double") / F.size(t)
    ).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic (Gopher-rule flavored):
    rewards reasonable length, stopword presence and lexical diversity;
    penalizes punctuation floods.  Pure arithmetic — SQL-twin-able."""
    n_tok = token_count(col)
    len_term = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(col, "en") * 4.0, F.lit(1.0))
    div_term = uniq_token_ratio(col)
    punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 5.0)
    return (
        len_term * 0.25 + stop_term * 0.25 + div_term * 0.25 + punct_term * 0.25
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts."""
    return {lang: stopword_hits(col, lang) for lang in LANG_ORDER}


def lang_id(col: Column | str) -> Column:
    """Argmax language by stopword hits; 'und' (undetermined) when no
    profile matches; ties break by LANG_ORDER.  A classic n-gram/stopword
    heuristic — deterministic, SQL-twin-able."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(expr)
    return expr


def fingerprint_md5(col: Column | str) -> Column:
    """Stable 64-bit-hex document fingerprint (first 16 md5 hex chars of the
    lowercased, whitespace-normalized text).  Exact-dedup key with an exact
    SQL twin in DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(c), r"\s+", " ")
    return F.substring(F.md5(normalized), 1, 16)


# -- rolling-hash fingerprint (polynomial 64-bit, Karp-Rabin style) ---------

_POLY_BASE = np.uint64(1099511628211)      # FNV prime as the base
_POLY_INIT = np.uint64(14695981039346656037)


@F.pandas_udf(T.LongType())
def rolling_fingerprint_udf(text: pd.Series) -> pd.Series:
    """64-bit rolling polynomial hash over utf-8 bytes (FNV-1a recurrence).

    Vectorized per batch: numpy over the byte array of each document — no
    per-character Python.  Not SQL-expressible → rows-only oracle check.
    """
    out = np.empty(len(text), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, s in enumerate(text.fillna("")):
            b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            h = _POLY_INIT
            # FNV-1a is inherently sequential, but chunk the fold in numpy:
            # h' = (h ^ b) * base  ==  h*base^n + f(bytes); compute via the
            # closed form: h_n = h0*B^n + sum(x_i * B^(n-i)) with x_i=(b_i
            # xor contribution) — xor breaks linearity, so use the classic
            # polynomial variant instead: h = sum(b_i * B^(n-1-i)) + B^n.
            n = b.size
            if n == 0:
                out[i] = _POLY_INIT
                continue
            powers = np.empty(n, dtype=np.uint64)
            powers[0] = np.uint64(1)
            if n > 1:
                np.multiply.accumulate(
                    np.full(n - 1, _POLY_BASE, dtype=np.uint64), out=powers[1:]
                )
            h = np.uint64(np.sum(b * powers[::-1], dtype=np.uint64))
            out[i] = h + powers[-1] * _POLY_BASE
    return pd.Series(out.astype(np.int64))


def rolling_fingerprint(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return rolling_fingerprint_udf(c)


# -- SQL twins for the DuckDB oracle ----------------------------------------

def sql_tokens(col: str) -> str:
    return f"list_filter(regexp_split_to_array({col}, '\\s+'), x -> x <> '')"


def sql_token_count(col: str) -> str:
    return f"len({sql_tokens(col)})"


def sql_punct_ratio(col: str) -> str:
    return (
        f"CASE WHEN length({col}) > 0 THEN "
        f"(length({col}) - length(regexp_replace({col}, '[.,!?;:]', '', 'g')))"
        f"::double / length({col}) ELSE 0.0 END"
    )


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def sql_stopword_hits(col: str, lang: str) -> str:
    return (
        f"len(list_filter({sql_tokens(col)}, "
        f"x -> list_contains({_sql_list(STOPWORDS[lang])}, lower(x))))"
    )


def sql_stopword_ratio(col: str, lang: str = "en") -> str:
    n = sql_token_count(col)
    return (
        f"CASE WHEN {n} > 0 THEN {sql_stopword_hits(col, lang)}::double / {n} "
        f"ELSE 0.0 END"
    )


def sql_uniq_token_ratio(col: str) -> str:
    t = sql_tokens(col)
    return (
        f"CASE WHEN len({t}) > 0 THEN len(list_distinct({t}))::double / len({t}) "
        f"ELSE 0.0 END"
    )


def sql_quality_score(col: str) -> str:
    return (
        f"(least({sql_token_count(col)}::double / 100.0, 1.0) * 0.25"
        f" + least({sql_stopword_ratio(col, 'en')} * 4.0, 1.0) * 0.25"
        f" + {sql_uniq_token_ratio(col)} * 0.25"
        f" + greatest(0.0, 1.0 - {sql_punct_ratio(col)} * 5.0) * 0.25)"
    )


def sql_lang_id(col: str) -> str:
    hits = {lang: sql_stopword_hits(col, lang) for lang in LANG_ORDER}
    best = "greatest(" + ", ".join(hits.values()) + ")"
    return (
        "CASE "
        + " ".join(
            f"WHEN {hits[lang]} = {best} AND {best} > 0 THEN '{lang}'"
            for lang in LANG_ORDER
        )
        + " ELSE 'und' END"
    )


def sql_fingerprint_md5(col: str) -> str:
    return f"substr(md5(regexp_replace(lower({col}), '\\s+', ' ', 'g')), 1, 16)"
