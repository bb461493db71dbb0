"""Adversarial-input property suite (r8, VERDICT r7 #8): hypothesis
strategies push NaN/±inf/zero-norm vectors, empty/whitespace/astral-
plane documents, and 1-pixel/degenerate images through the ANN, dedup,
pHash, and BPE kernels.

Documented reject-or-propagate policy per kernel family:

- **ANN numpy kernels** (`similarity.unit_rows`, wired into GEMM
  bucketing, LSH verify, numpy/blocked top-k, PQ train/scan): rows with
  any non-finite component are REPLACED BY ZERO — they score cos 0
  everywhere, rank last, and never poison argpartition order or another
  row's score. Zero-norm rows likewise score 0. Deterministic.
- **JVM expression paths** (cosine_pairs, int8): non-finite cosines
  fail every `>= threshold` predicate (NaN comparisons are false) —
  adversarial rows are EXCLUDED from pair output, never emitted.
- **pHash/dHash**: defined for ANY 2-D array (1×1, 1×N, constant, all
  extremes) — degenerate images hash deterministically (constant image
  → hash 0); non-finite grays cannot occur from the codecs (uint8) and
  propagate harmlessly into a deterministic hash if forced.
- **BPE**: empty/whitespace-only docs tokenize to nothing (absent from
  token counts — REJECT by omission); astral-plane text is handled per
  Python code point; segmentation always reassembles to the word.
- **JPEG/PNG decode**: arbitrary corrupt bytes must raise ValueError /
  NotImplementedError / NoScanData ONLY (the quarantine/degrade
  contract) — never IndexError/KeyError/struct.error or a hang.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from azure_airbnb_cdc_ingestion_pipeline_spark.functions.bpe import (
    _merge_loop_fast,
    _merge_loop_reference,
    bpe_segment,
    bpe_segment_reference,
)
from azure_airbnb_cdc_ingestion_pipeline_spark.functions.phash import (
    bilinear_resize,
    dhash64,
    phash64,
)
from azure_airbnb_cdc_ingestion_pipeline_spark.operators.similarity import (
    unit_rows,
)

_SETTINGS = dict(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

finite_or_not = st.one_of(
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.just(0.0),
)


# ---------------------------------------------------------------- ANN


@given(
    st.lists(
        st.lists(finite_or_not, min_size=4, max_size=4),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_unit_rows_policy(rows):
    M = np.array(rows, dtype=np.float64)
    U = unit_rows(M)
    assert np.isfinite(U).all()  # output NEVER carries non-finites
    for i, r in enumerate(M):
        n = np.linalg.norm(r)
        if not np.isfinite(r).all() or n == 0.0 or not np.isfinite(n):
            assert (U[i] == 0.0).all()  # reject-to-zero policy
        else:
            assert np.linalg.norm(U[i]) == pytest.approx(1.0)


@given(
    st.lists(
        st.lists(finite_or_not, min_size=4, max_size=4),
        min_size=2,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_adversarial_rows_never_poison_scores(rows):
    """A NaN/inf row must not perturb any OTHER row's cosine."""
    M = np.array(rows, dtype=np.float64)
    U = unit_rows(M)
    S = U @ U.T
    assert np.isfinite(S).all()
    good = [
        i
        for i, r in enumerate(M)
        if np.isfinite(r).all() and np.linalg.norm(r) > 0
    ]
    if good:
        Ug = unit_rows(M[good])
        Sg = Ug @ Ug.T
        assert np.allclose(S[np.ix_(good, good)], Sg)


# ------------------------------------------------------------- pHash


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=255),
)
@settings(**_SETTINGS)
def test_phash_dhash_defined_on_degenerate_images(h, w, v):
    img = np.full((h, w), v, dtype=np.uint8).astype(float)
    # constant images hash DETERMINISTICALLY (the exact value is fp-
    # noise-dependent — DCT of a constant leaves ~1e-14 residues whose
    # median split is stable but not zero) and never crash at any size
    p = phash64(img)
    assert isinstance(p, int) and 0 <= p < (1 << 63)
    assert phash64(img.copy()) == p
    d = dhash64(img)
    assert dhash64(img.copy()) == d


@given(
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=64),
)
@settings(**_SETTINGS)
def test_bilinear_resize_any_geometry(h, w, nh, nw):
    rng = np.random.default_rng(h * 1000 + w * 100 + nh * 10 + nw)
    img = rng.uniform(0, 255, (h, w))
    out = bilinear_resize(img, nh, nw)
    assert out.shape == (nh, nw)
    assert np.isfinite(out).all()
    assert out.min() >= img.min() - 1e-9 and out.max() <= img.max() + 1e-9


def test_phash_one_pixel_image_roundtrips_through_codecs():
    from azure_airbnb_cdc_ingestion_pipeline_spark.functions.codecs import (
        encode_png,
    )
    from azure_airbnb_cdc_ingestion_pipeline_spark.functions.phash import (
        decode_gray,
    )

    png = encode_png(1, 1, 1, bytes([137]))
    g = decode_gray(png)
    assert g.shape == (1, 1)
    assert isinstance(phash64(g), int)


# --------------------------------------------------------------- BPE

words = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=97, max_codepoint=122),
        st.sampled_from("🦀🌍𐍈你好 \t"),
    ),
    min_size=0,
    max_size=12,
)


@given(st.lists(st.tuples(words, st.integers(1, 9)), min_size=0, max_size=12),
       st.integers(0, 20))
@settings(**_SETTINGS)
def test_bpe_trainer_adversarial_corpora(corpus, k):
    """Fast == reference on arbitrary (astral-plane, whitespace-bearing)
    word-frequency tables. Whitespace INSIDE a word form is legal here —
    the tokenizer upstream guarantees none, but the trainer must not
    care."""
    seg: dict[tuple, int] = {}
    for w, f in corpus:
        if w:
            seg[tuple(w)] = seg.get(tuple(w), 0) + f
    assert _merge_loop_fast(dict(seg), k) == _merge_loop_reference(
        dict(seg), k
    )


@given(words, st.lists(st.tuples(words.filter(bool), words.filter(bool)),
                       max_size=10))
@settings(**_SETTINGS)
def test_bpe_segment_reassembles_and_matches_reference(word, merges):
    got = bpe_segment(word, merges)
    assert "".join(got) == word  # segmentation is a partition of the word
    assert got == bpe_segment_reference(word, merges)


# ------------------------------------------------------------- codecs


@given(st.binary(min_size=0, max_size=400), st.integers(0, 3))
@settings(**_SETTINGS)
def test_jpeg_decode_rejects_garbage_with_contract_errors(blob, prefix):
    from azure_airbnb_cdc_ingestion_pipeline_spark.functions.jpeg_codec import (
        decode_jpeg,
    )

    payload = [b"", b"\xff\xd8", b"\xff\xd8\xff\xe0", b"\xff"][prefix] + blob
    try:
        decode_jpeg(payload)
    except (ValueError, NotImplementedError):
        pass  # the contract: quarantine (ValueError) or degrade


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_jpeg_truncation_and_bitflip_fuzz(data):
    """Start from a VALID subsampled JPEG, then truncate or flip bytes:
    decode must either succeed or raise a contract error — never an
    IndexError/KeyError/struct.error."""
    from azure_airbnb_cdc_ingestion_pipeline_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.random.default_rng(5).integers(0, 255, (24, 16, 3)).astype(
        np.uint8
    )
    good = encode_jpeg(16, 24, 3, img.tobytes(), subsampling="420")
    mode = data.draw(st.sampled_from(["truncate", "flip"]))
    if mode == "truncate":
        cut = data.draw(st.integers(0, len(good)))
        payload = good[:cut]
    else:
        pos = data.draw(st.integers(0, len(good) - 1))
        val = data.draw(st.integers(0, 255))
        payload = good[:pos] + bytes([val]) + good[pos + 1:]
    try:
        out = decode_jpeg(payload)
        assert out["channels"] in (1, 3)
    except (ValueError, NotImplementedError):
        pass


@given(st.binary(min_size=0, max_size=300))
@settings(**_SETTINGS)
def test_png_decode_rejects_garbage_with_contract_errors(blob):
    from azure_airbnb_cdc_ingestion_pipeline_spark.functions.codecs import (
        decode_png,
    )

    try:
        decode_png(b"\x89PNG\r\n\x1a\n" + blob)
    except (ValueError, NotImplementedError):
        pass
