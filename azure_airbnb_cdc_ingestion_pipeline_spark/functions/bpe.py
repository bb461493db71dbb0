"""Deterministic byte-pair-encoding: distributed statistics, bounded
driver merges, distributed encoding.

`corpus_budget_select` / `sequence_pack_chunks` count tokens with a
regex approximation (`text.bpe_ish_tokens`); for token-budget decisions
that must match what a real trainer consumes, the pipeline needs TRUE
subword counts (VERDICT r6 #6). This module trains a BPE merge table on
the corpus and re-encodes it, Spark-first:

- **Training statistics are distributed**: one shuffle aggregates the
  (word, freq) table — the sufficient statistic for classic BPE
  (Sennrich et al. 2016 train on word frequencies, not raw text). The
  table is vocabulary-bounded (Heaps-law √corpus growth), and a
  deterministic `vocab_cap` (top-K by freq DESC, word ASC) makes the
  driver-side bound a CONTRACT, not a hope — at 100 TB you cap at a few
  million word forms and the tail (which cannot win merge counts
  anyway) stays out of the driver.
- **Merge selection is a driver loop over that bounded table**: each of
  `num_merges` rounds counts adjacent symbol pairs (occurrence-weighted,
  overlapping positions all count — the standard formulation), picks
  argmax with a total-order tiebreak (count DESC, left ASC, right ASC),
  and applies the merge with a greedy left-to-right non-overlapping
  scan. Everything is pure deterministic Python on ≤ vocab_cap rows.
- **Encoding is distributed again**: the merge list broadcasts in a
  task closure; each DISTINCT word is segmented once (apply merges in
  rank order, each exhaustively — equivalent to the training
  segmentation), and per-doc token counts come from a broadcast
  word→length join, never per-row Python on the corpus.

The DuckDB oracle replicates training + encoding end-to-end in pure
SQL (generated round-unrolled CTEs — `plans.extensions_r7`), so the
merge table AND the per-doc encoded lengths are hash-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_word(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    """Greedy left-to-right non-overlapping merge of (left,right)."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 16,
    vocab_cap: int = 65536,
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merges from the corpus. Returns the merge
    list in rank order. Driver memory is bounded by `vocab_cap` word
    forms (deterministic top-K: freq DESC, word ASC); rounds that find
    no remaining adjacent pair stop early."""
    wf = (
        _word_freqs(docs, text_col)
        .orderBy(F.col("freq").desc(), F.col("w"))
        .limit(vocab_cap)
        .collect()
    )
    seg: dict[tuple[str, ...], int] = {}
    for r in wf:
        seg[tuple(r.w)] = seg.get(tuple(r.w), 0) + r.freq
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in seg.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        merges.append(best)
        new_seg: dict[tuple[str, ...], int] = {}
        for syms, freq in seg.items():
            ns = _merge_word(syms, *best)
            new_seg[ns] = new_seg.get(ns, 0) + freq
        seg = new_seg
    return merges


def bpe_segment(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode one word: apply merges in rank order, each exhaustively —
    reproduces the training segmentation for in-corpus words and
    composes learned subwords for unseen ones."""
    syms: tuple[str, ...] = tuple(word)
    for left, right in merges:
        if len(syms) < 2:
            break
        syms = _merge_word(syms, left, right)
    return list(syms)


def bpe_merges_frame(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """(rank, lhs, rhs, merged) — the learned vocab as a DataFrame."""
    rows = [
        (i + 1, l, r, l + r) for i, (l, r) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, lhs string, rhs string, merged string"
    )


def bpe_doc_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens): true subword counts per doc.

    Scale shape: tokenize → ONE distinct-word reduce → per-distinct-word
    Python encode (vocabulary-bounded Arrow pass, merge list in the
    closure) → broadcast word→length join back onto the token stream →
    per-doc sum. The corpus-sized stages are all JVM; Python touches
    only distinct word forms."""
    import pandas as pd

    tok = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"),
    ).filter(F.col("w") != "")
    distinct_words = tok.select("w").distinct()

    def enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "w": pdf["w"],
                    "n": [len(bpe_segment(w, merges)) for w in pdf["w"]],
                }
            )

    word_len = distinct_words.mapInPandas(enc, "w string, n long")
    return (
        tok.join(F.broadcast(word_len), "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n").alias("n_bpe_tokens"),
        )
    )
