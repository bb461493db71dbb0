"""Round-10 catalog extensions: the web-corpus front door.

VERDICT r9 residuals 5-6: the engine read parquet/CSV/JSONL only, but a
real 100 TB LLM corpus arrives as WARC/WET crawl containers full of
HTML. This round adds both front-door stages, each oracle-gated:

- `source_warc_read` / `source_warc_rejects` — WARC/WET ingestion with
  the reject side channel (`sources/warc.py`): multi-member-gzip walk,
  spec-mandatory header validation, resync-past-malformed. Fixtures are
  WRITTEN by the engine's own distributed WARC writer, then read back;
  the oracle is the originating `documents` table (round-trip identity)
  resp. the pinned per-reason reject counts.
- `text_html_extract` — HTML → main-content text
  (`functions/text.py::html_extract_text`), pure JVM regex/arrays:
  chrome-container strip, block-closer line mapping, tag strip, entity
  decode, jusText-style short-line gate. The fixture wraps each doc in
  a boilerplate-heavy page template; the oracle applies only the line
  gate to the clean text (everything else must cancel exactly).
"""

from __future__ import annotations

import gzip
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, query

_URI_PREFIX = "http://corpus.example/doc/"


def _fixture_dir(kind: str, sf_dir: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"{kind}_fixture_{tag}")


def _warc_rec(
    body: bytes = b"payload body",
    uri: str = "http://x/ok",
    version: str = "WARC/1.0",
    clen: str | None = None,
    drop_id: bool = False,
) -> bytes:
    h = [
        version.encode(),
        b"WARC-Type: conversion",
        b"WARC-Target-URI: " + uri.encode(),
        b"WARC-Date: 2024-01-01T00:00:00Z",
    ]
    if not drop_id:
        h.append(b"WARC-Record-ID: <urn:uuid:fixture>")
    h.append(
        b"Content-Length: "
        + (str(len(body)) if clen is None else clen).encode()
    )
    return b"\r\n".join(h) + b"\r\n\r\n" + body + b"\r\n\r\n"


@query(
    "source_warc_read",
    oracle="SELECT doc_id, text FROM documents",
)
def q_source_warc_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC/WET round trip under the oracle gate (VERDICT r9 #5): the
    documents table is written as gzip-multi-member WET conversion
    records (one file per partition — the Common Crawl unit of
    parallelism; payload bytes never shuffle on either leg), a corrupt
    trailing file is planted, and `read_warc_with_rejects` must recover
    every good record byte-exactly (doc_id parsed back from the target
    URI, text from the length-delimited payload) while the plant lands
    in the reject channel (pinned by `source_warc_rejects`), never in a
    task failure."""
    from ..session import fan_out
    from ..sources.warc import read_warc_with_rejects, write_warc

    tmp = _fixture_dir("warc", sf_dir)
    shutil.rmtree(tmp, ignore_errors=True)
    src = fan_out(_t(spark, sf_dir, "documents").select("doc_id", "text")).select(
        F.concat(F.lit(_URI_PREFIX), F.col("doc_id")).alias("target_uri"),
        "text",
    )
    write_warc(src, tmp)
    with open(os.path.join(tmp, "part-corrupt.wet.gz"), "wb") as f:
        f.write(gzip.compress(_warc_rec(clen="xx")))  # diverts, not fails
    good, _rejects = read_warc_with_rejects(spark, tmp)
    return good.select(
        F.regexp_extract("target_uri", "doc/([0-9]+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.decode("payload", "utf-8").alias("text"),
    )


@query(
    "source_warc_rejects",
    # every malformation class the parser diverts, planted exactly once
    oracle="""
    SELECT * FROM (VALUES
      ('bad_content_length',        CAST(1 AS BIGINT)),
      ('bad_magic',                 CAST(1 AS BIGINT)),
      ('corrupt_gzip_member',       CAST(1 AS BIGINT)),
      ('good',                      CAST(3 AS BIGINT)),
      ('missing_required_header',   CAST(1 AS BIGINT)),
      ('payload_truncated',         CAST(1 AS BIGINT)),
      ('unsupported_warc_version',  CAST(1 AS BIGINT))
    ) AS t(reject_reason, n)
    """,
)
def q_source_warc_rejects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reject-channel contract, reason by reason: a gzip WARC with a
    bad Content-Length, a missing mandatory header, an unsupported
    version, and a corrupt gzip member, plus a PLAIN (uncompressed)
    WARC with leading junk (bad magic) and a truncated final payload —
    interleaved with three good records that must all survive the
    resyncs (counted under the sentinel reason 'good'). Every reason
    count is pinned; a parser that silently skips or double-counts any
    class goes red here."""
    from ..sources.warc import read_warc_with_rejects

    tmp = _fixture_dir("warcrej", sf_dir)
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    with open(os.path.join(tmp, "a.warc.gz"), "wb") as f:
        f.write(gzip.compress(_warc_rec(uri="http://x/good1")))
        f.write(gzip.compress(_warc_rec(clen="xx")))
        f.write(gzip.compress(_warc_rec(drop_id=True)))
        f.write(gzip.compress(_warc_rec(version="WARC/9.9")))
        gz = gzip.compress(_warc_rec(uri="http://x/never"))
        f.write(gz[:18] + b"\xde\xad\xbe\xef")  # corrupt member, no resync tail
    with open(os.path.join(tmp, "b.warc"), "wb") as f:
        f.write(b"JUNK-NOT-WARC\r\n")  # bad magic, resync to next record
        f.write(_warc_rec(uri="http://x/good2"))
        f.write(_warc_rec(uri="http://x/good3"))
        f.write(_warc_rec(body=b"cut off here")[:-8])  # payload truncated
    good, rejects = read_warc_with_rejects(spark, tmp)
    return (
        rejects.groupBy("reject_reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .unionByName(
            good.agg(
                F.lit("good").alias("reject_reason"),
                F.count(F.lit(1)).alias("n"),
            )
        )
    )


@query(
    "text_html_extract",
    # the template-side strip must cancel EXACTLY: chrome containers,
    # tags, and entity escaping all vanish, so the oracle is just the
    # line gate (trim, keep >= 30 chars) over the clean text
    oracle="""
    SELECT doc_id,
           coalesce(
             list_aggregate(
               list_filter(
                 list_transform(string_split(text, chr(10)), x -> trim(x)),
                 x -> length(x) >= 30),
               'string_agg', chr(10)),
             '') AS main_text
    FROM documents
    """,
)
def q_text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → main-content extraction under the oracle gate (VERDICT r9
    #6): each doc's text is entity-escaped and embedded in a
    boilerplate-heavy page (title, style+script head, nav crumbs,
    header/footer/aside chrome, a share-button short-line cluster, an
    HTML comment) and `html_extract_text` must recover exactly the
    line-gated clean text — any chrome leakage, missed tag, wrong
    entity order, or gate drift shows up as a value mismatch. The
    pipeline is one chain of JVM regexp/array expressions over a scan:
    no shuffle, no Python, whole-stage codegen end to end."""
    from ..functions.text import html_extract_text

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    esc = F.col("text")
    for ch, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(ch), F.lit(ent))
    html = F.concat(
        F.lit(
            "<html><head><title>A page</title><style>body{color:red}"
            "</style><script>var x = '</div>';</script></head>\n"
            "<body><nav><a href='/'>Home</a> | <a href='/a'>About</a>"
            "</nav>\n<header><h1>Page heading</h1></header>\n"
            "<!-- rendered by corpus-gen -->\n"
            "<p>Share</p><p>Tweet</p><p>42 comments</p>\n"
            '<div id="main"><p>'
        ),
        esc,
        F.lit(
            "</p></div>\n<aside>Related: <a href='/x'>x</a></aside>\n"
            "<footer>&copy; 2024 Example Corp</footer></body></html>"
        ),
    )
    return docs.select(
        "doc_id",
        html_extract_text(html).alias("main_text"),
    )


@query(
    "text_nb_classifier",
    oracle="""
    WITH base AS (
      SELECT doc_id, text,
             CASE WHEN length(text) >= 180 THEN 1 ELSE 0 END AS label,
             doc_id % 10 < 8 AS is_train
      FROM documents
    ),
    tok AS (
      SELECT doc_id, label, is_train, t.term
      FROM base, unnest(string_split(lower(text), ' ')) AS t(term)
      WHERE t.term <> ''
    ),
    counts AS (
      SELECT term,
             sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS c0
      FROM tok WHERE is_train GROUP BY term HAVING count(*) >= 5
    ),
    tot AS (
      SELECT sum(c1) AS n1, sum(c0) AS n0, count(*) AS v FROM counts
    ),
    weights AS (
      SELECT term,
             CAST(round((ln((c1 + 1.0) / (tot.n1 + tot.v))
                   - ln((c0 + 1.0) / (tot.n0 + tot.v))) * 10000) AS BIGINT)
               AS w
      FROM counts CROSS JOIN tot
    ),
    prior AS (
      SELECT CAST(round(ln((sum(label) + 1.0)
                    / (count(*) - sum(label) + 1.0)) * 10000) AS BIGINT)
               AS p
      FROM base WHERE is_train
    ),
    tf AS (
      SELECT doc_id, label, term, count(*) AS tf
      FROM tok WHERE NOT is_train GROUP BY doc_id, label, term
    ),
    scored AS (
      SELECT tf.doc_id, tf.label,
             sum(tf.tf * weights.w) AS lik
      FROM tf JOIN weights USING (term)
      GROUP BY tf.doc_id, tf.label
    )
    SELECT base.doc_id,
           base.label,
           CAST(prior.p + coalesce(scored.lik, 0) AS BIGINT) AS nb_score_1e4,
           CASE WHEN prior.p + coalesce(scored.lik, 0) > 0
                THEN 1 ELSE 0 END AS pred
    FROM base CROSS JOIN prior
    LEFT JOIN scored ON scored.doc_id = base.doc_id
    WHERE NOT base.is_train
    """,
)
def q_text_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed multinomial Naive-Bayes quality classifier — the
    model-based filtering step of modern LLM curation (fastText-style
    classifiers in the GPT-3 / CCNet recipes): TRAIN on an 80% split
    against a deterministic weak label (doc length >= 180 chars), then
    SCORE the 20% held-out split with Laplace-smoothed log-likelihood
    ratios. Both phases are pure DataFrame aggregation — training a
    text classifier at 100 TB without leaving the JVM.

    Scale posture: training reduces to one (term,label)-keyed count of
    the train split (the only wide exchange over the big side); the
    model itself is the vocab-capped weight table (HAVING count>=5 —
    bounded rows) broadcast to the scoring join; totals/prior are
    1-row broadcast cross joins. Scoring shuffles only (doc,term)
    pairs of the 20% split. Weights are quantized to integer 1e-4 units
    (BIGINT) on both engines before the dot product, so the score is
    an EXACT integer sum — immune to FP summation order, which the
    first cut (4-dp rounded double sum) was not: one held-out doc
    landed within 1 ulp of a rounding boundary and hashed differently
    across sessions."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.when(F.length("text") >= 180, F.lit(1)).otherwise(0).alias(
            "label"
        ),
        (F.col("doc_id") % 10 < 8).alias("is_train"),
    )
    tok = docs.select(
        "doc_id",
        "label",
        "is_train",
        F.explode(F.split(F.lower("text"), " ")).alias("term"),
    ).filter(F.col("term") != "")
    counts = (
        tok.filter("is_train")
        .groupBy("term")
        .agg(
            F.sum(F.col("label")).alias("c1"),
            F.sum(1 - F.col("label")).alias("c0"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 5)
    )
    tot = counts.agg(
        F.sum("c1").alias("n1"),
        F.sum("c0").alias("n0"),
        F.count(F.lit(1)).alias("v"),
    )
    weights = counts.crossJoin(F.broadcast(tot)).select(
        "term",
        F.round(
            (
                F.log((F.col("c1") + 1.0) / (F.col("n1") + F.col("v")))
                - F.log((F.col("c0") + 1.0) / (F.col("n0") + F.col("v")))
            )
            * 10000
        )
        .cast("long")
        .alias("w"),
    )
    prior = (
        docs.filter("is_train")
        .agg(
            F.round(
                F.log(
                    (F.sum("label") + 1.0)
                    / (F.count(F.lit(1)) - F.sum("label") + 1.0)
                )
                * 10000
            )
            .cast("long")
            .alias("p")
        )
    )
    tf = (
        tok.filter(~F.col("is_train"))
        .groupBy("doc_id", "label", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = (
        tf.join(F.broadcast(weights), "term")
        .groupBy("doc_id", "label")
        .agg(F.sum(F.col("tf") * F.col("w")).alias("lik"))
    )
    held = docs.filter(~F.col("is_train")).select("doc_id", "label")
    return (
        held.crossJoin(F.broadcast(prior))
        .join(scored.select("doc_id", "lik"), "doc_id", "left")
        .select(
            "doc_id",
            "label",
            (F.col("p") + F.coalesce(F.col("lik"), F.lit(0))).alias(
                "nb_score_1e4"
            ),
            F.when(
                F.col("p") + F.coalesce(F.col("lik"), F.lit(0)) > 0,
                F.lit(1),
            )
            .otherwise(0)
            .alias("pred"),
        )
    )

