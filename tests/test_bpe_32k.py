"""r9 production-merge-count BPE golden (VERDICT r8 #6): real tokenizers
run 32 k–100 k merges; the r8 incremental trainer made that cheap (~3 s
driver wall for 32 768 merges on a 24 k-word corpus), so pin it — a
frozen 32 768-merge golden plus fast-vs-reference segmenter spot-checks
under the full 32 k table. The 16-merge DuckDB-oracled catalog keys are
untouched; this extends the frozen-behavior ladder past the r8 1 024
golden."""

import hashlib

import numpy as np

from azure_airbnb_cdc_ingestion_pipeline_spark.functions.bpe import (
    _merge_loop_fast,
    bpe_ranks,
    bpe_segment,
    bpe_segment_reference,
)

_ALPHA = list("abcdefghijklmnop")

#: md5 of repr(merge table) for _rich32(24000) @ 32768 merges — frozen;
#: regenerate ONLY for a deliberate, documented semantic change.
GOLDEN_32768 = "2c2d959f10104391ddb1e7d8a229358a"


def _rich32(n_words: int = 24000, seed: int = 0xB9E32) -> dict:
    """Zipf-ish synthetic vocabulary with enough pair diversity to
    sustain 32 k merges (word length 3–15 over a 16-letter alphabet)."""
    rng = np.random.default_rng(seed)
    seg: dict[tuple, int] = {}
    for i in range(n_words):
        ln = int(rng.integers(3, 16))
        w = "".join(rng.choice(_ALPHA, size=ln))
        f = int(np.ceil(n_words / (1 + i % 977)))
        seg[tuple(w)] = seg.get(tuple(w), 0) + f
    return seg


def test_golden_32768_merges():
    merges = _merge_loop_fast(_rich32(), 32768)
    assert len(merges) == 32768
    h = hashlib.md5(repr(merges).encode()).hexdigest()
    assert h == GOLDEN_32768, f"32k merge-table hash drifted: {h}"


def test_segmenter_parity_under_32k_table():
    """The rank-scheduled segmenter must equal the naive reference scan
    under the full production-size table — vocabulary words AND unseen
    strings (which exercise partial-merge schedules)."""
    seg = _rich32()
    merges = _merge_loop_fast(dict(seg), 32768)
    ranks = bpe_ranks(merges)
    rng = np.random.default_rng(7)
    words = ["".join(t) for t in list(seg)[:60]] + [
        "".join(rng.choice(_ALPHA, size=int(rng.integers(1, 24))))
        for _ in range(60)
    ]
    for w in words:
        assert bpe_segment(w, merges, ranks) == bpe_segment_reference(
            w, merges
        ), w
