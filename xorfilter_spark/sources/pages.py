"""Common-Crawl-style web-page source.

``BASELINE.json``'s input_hint fixes the input shape: an Iceberg/parquet
table of web pages with columns ``(url string, warc_ts timestamp,
html binary, text string, lang string)``.  No external data exists in this
sandbox, so this module *synthesizes* that table deterministically from the
driver-provided ``documents`` parquet (seeded, reproducible at any SF) and
implements the extraction invariant the north rule demands: **byte-identical
extracted text per url** — ``extract_text(html) == text`` for every row.

Scale design: synthesis and extraction are pure column expressions /
Arrow-vectorized pandas UDFs (no per-row Python), so the same code runs over
a 10^12-row Iceberg table — the driver only ever sees ``DataFrame`` in,
``DataFrame`` out.  Extraction is a narrow map (no shuffle); the scan only
needs (html) or (url) columns thanks to column pruning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# fixed crawl epoch so warc_ts is deterministic (no wall clock anywhere)
_CRAWL_EPOCH = "2024-01-01 00:00:00"

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def url_col(source: Column, doc_id: Column) -> Column:
    """Deterministic url per document: https://{source}.example.org/p/{id}."""
    return F.concat(
        F.lit("https://"), source, F.lit(".example.org/p/"), doc_id.cast("string")
    )


def html_col(title: Column, text: Column) -> Column:
    """Wrap extracted text in a deterministic HTML page (binary, utf-8).

    The payload paragraph is HTML-escaped exactly like a real extractor's
    inverse (&, <, > only — the minimal well-formed set), surrounded by
    boilerplate (head/nav/footer) that the extractor must strip.
    """
    escaped = _escape_html(text)
    doc = F.concat(
        F.lit("<html><head><title>"),
        _escape_html(title),
        F.lit('</title></head><body><nav><a href="/">home</a> | '
              '<a href="/about">about</a></nav><article>'),
        escaped,
        F.lit("</article><footer>&copy; example.org crawl fixture</footer>"
              "</body></html>"),
    )
    return F.encode(doc, "UTF-8")


def _escape_html(c: Column) -> Column:
    return F.replace(
        F.replace(F.replace(c, F.lit("&"), F.lit("&amp;")), F.lit("<"), F.lit("&lt;")),
        F.lit(">"),
        F.lit("&gt;"),
    )


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Extract article text from raw HTML bytes — vectorized, Arrow-batched.

    The per-row invariant (input_hint): for every url,
    ``extract_text(html) == text`` byte-identically.  Strips everything
    outside <article>…</article> and reverses minimal HTML escaping.
    """
    s = html.str.decode("utf-8", errors="replace").fillna("")
    # (?s): article bodies may span newlines — without DOTALL a multiline
    # body would extract as '' and silently break the byte-identity invariant
    body = s.str.extract(r"(?s)<article>(.*?)</article>", expand=False).fillna("")
    body = body.str.replace("&lt;", "<", regex=False)
    body = body.str.replace("&gt;", ">", regex=False)
    body = body.str.replace("&amp;", "&", regex=False)
    return body


def extract_text_col(html: Column | str) -> Column:
    c = F.col(html) if isinstance(html, str) else html
    return extract_text_udf(c)


def synth_pages(
    spark: SparkSession, sf_dir: str, recrawl: bool = True
) -> DataFrame:
    """Deterministic Common-Crawl-shaped table from the documents fixture.

    Columns exactly per input_hint: (url, warc_ts, html, text, lang).
    warc_ts = fixed crawl epoch + doc_id seconds (no wall clock).

    ``recrawl=True`` (default) re-emits every 20th url a day later with
    identical html/text — the re-crawled-hot-url duplicate skew the north
    rule requires the bank build to absorb (handled by the map-side
    ``dropDuplicates`` partial aggregate / kernel dedup; text extraction
    stays byte-identical per url across crawls).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    title = F.concat(F.lit("doc "), F.col("doc_id").cast("string"))

    def project(d: DataFrame, day_offset: int) -> DataFrame:
        return d.select(
            url_col(F.col("source"), F.col("doc_id")).alias("url"),
            (
                F.to_timestamp(F.lit(_CRAWL_EPOCH))
                + F.make_interval(days=F.lit(day_offset), secs=F.col("doc_id"))
            ).alias("warc_ts"),
            html_col(title, F.col("text")).alias("html"),
            F.col("text"),
            F.col("lang"),
        )

    first = project(docs, 0)
    if not recrawl:
        return first
    return first.unionByName(project(docs.where(F.col("doc_id") % 20 == 0), 1))


def extraction_parity(pages: DataFrame) -> DataFrame:
    """One-row report: total urls vs urls whose re-extracted text is
    byte-identical to the stored text column (north-rule invariant)."""
    extracted = pages.select(
        "url", "text", extract_text_col("html").alias("extracted")
    )
    return extracted.agg(
        F.count("*").alias("n_rows"),
        F.sum((F.col("text") == F.col("extracted")).cast("long")).alias("n_identical"),
        F.sum((F.col("text") != F.col("extracted")).cast("long")).alias("n_mismatch"),
    )


def write_pages(pages: DataFrame, path: str, mode: str = "overwrite") -> None:
    pages.write.mode(mode).parquet(path)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
