"""Deterministic BPE: training, encoding, and the packing-parity path
(r7, VERDICT r6 #6). The catalog keys hash-gate the full train+encode
pipeline against the SQL re-implementation; these tests pin the
operator-level semantics the oracle can't isolate."""

import pytest
from pyspark.sql import functions as F

from azure_airbnb_cdc_ingestion_pipeline_spark.functions.bpe import (
    _merge_word,
    bpe_doc_token_counts,
    bpe_segment,
    train_bpe,
)


def test_merge_word_greedy_nonoverlapping():
    assert _merge_word(tuple("aaa"), "a", "a") == ("aa", "a")
    assert _merge_word(tuple("aaaa"), "a", "a") == ("aa", "aa")
    assert _merge_word(tuple("abab"), "a", "b") == ("ab", "ab")
    assert _merge_word(("x", "ab", "ab"), "ab", "ab") == ("x", "abab")
    assert _merge_word(tuple("xyz"), "a", "b") == ("x", "y", "z")


def test_train_bpe_hand_corpus(spark):
    # freq-weighted: 'abab' x3 (pairs ab:6-2? occurrences: (a,b)x2,(b,a)x1
    # per word) — (a,b) count 6, (b,a) 3, so rank-1 merge is (a,b)
    docs = spark.createDataFrame(
        [("abab abab abab",), ("ab",)], "text string"
    )
    merges = train_bpe(docs, num_merges=2)
    assert merges[0] == ("a", "b")
    # after merging: 'abab' -> [ab, ab] — rank 2 is (ab, ab)
    assert merges[1] == ("ab", "ab")


def test_train_bpe_tiebreak_lexicographic(spark):
    # 'cd' and 'ab' both count 1 — the (count DESC, l ASC, r ASC) order
    # must pick (a,b) first, deterministically
    docs = spark.createDataFrame([("cd ab",)], "text string")
    merges = train_bpe(docs, num_merges=2)
    assert merges == [("a", "b"), ("c", "d")]


def test_encode_matches_training_segmentation(spark, sf_dir):
    """Rank-order exhaustive re-encoding reproduces the training
    segmentation for every in-corpus word — the equivalence the
    text_bpe_encode oracle leans on."""
    from azure_airbnb_cdc_ingestion_pipeline_spark.plans.queries import _t

    docs = _t(spark, sf_dir, "documents")
    merges = train_bpe(docs, num_merges=16)
    words = [
        r.w
        for r in docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .distinct()
        .collect()
    ]
    # training-side segmentation: replay the merge loop
    seg = {w: tuple(w) for w in words}
    for m in merges:
        seg = {w: _merge_word(s, *m) for w, s in seg.items()}
    for w in words:
        assert bpe_segment(w, merges) == list(seg[w]), w


def test_unseen_word_composes_learned_subwords(spark):
    docs = spark.createDataFrame([("lower lower newer",)], "text string")
    merges = train_bpe(docs, num_merges=3)
    out = bpe_segment("slower", merges)  # not in corpus
    assert "".join(out) == "slower"
    assert len(out) < len("slower")  # at least one learned merge applied


def test_vocab_cap_bounds_and_is_deterministic(spark):
    docs = spark.createDataFrame(
        [("aa bb aa cc aa bb",)], "text string"
    )
    m1 = train_bpe(docs, num_merges=1, vocab_cap=1)
    # cap=1 keeps only the most frequent word 'aa' -> merge (a,a)
    assert m1 == [("a", "a")]
    assert train_bpe(docs, num_merges=1, vocab_cap=1) == m1


def test_doc_token_counts_shape(spark):
    docs = spark.createDataFrame(
        [(1, "abab ab"), (2, "abab abab")], "doc_id long, text string"
    )
    merges = [("a", "b"), ("ab", "ab")]
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_doc_token_counts(docs, merges).collect()
    }
    # 'abab' -> [abab] (1 token), 'ab' -> [ab] (1 token)
    assert got == {1: (2, 2), 2: (2, 2)}


def test_early_stop_when_fully_merged(spark):
    docs = spark.createDataFrame([("ab ab",)], "text string")
    merges = train_bpe(docs, num_merges=50)
    assert len(merges) == 1  # (a,b) exhausts the pair space
