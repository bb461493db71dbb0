"""Bit-parity of the vectorized JPEG entropy coder (`_entropy_scan_vec`)
against the retained scalar writer path (`_BitWriter` + `_encode_dc` +
`_encode_ac_band`) — the 'executable spec' the r10 vectorization claims
to reproduce (this file is the parity pin its docstring references;
r11, advisor item). The scalar reference below implements the same scan
semantics: blocks in scan order, DC predictors per component reset at
restart segments, AC band [lo, hi], per-segment 1-bit padding + RSTm."""

import numpy as np
import pytest

from azure_airbnb_cdc_ingestion_pipeline_spark.functions import jpeg_codec as J


def _scalar_scan(seqs, tsel, comp, unit, ri, emit_dc, lo, hi) -> bytes:
    out = bytearray()
    n = seqs.shape[0]
    seg = (unit // ri) if ri else np.zeros(n, dtype=np.int64)
    w = J._BitWriter()
    prev_dc: dict[int, int] = {}
    rst = 0
    for i in range(n):
        if i and seg[i] != seg[i - 1]:
            out += w.flush()
            out += bytes((0xFF, 0xD0 + (rst & 7)))
            rst = (rst + 1) & 7
            w = J._BitWriter()
            prev_dc = {}
        t = int(tsel[i])
        if emit_dc:
            c = int(comp[i])
            diff = int(seqs[i, 0]) - prev_dc.get(c, 0)
            prev_dc[c] = int(seqs[i, 0])
            J._encode_dc(w, J._ENC_DC[t], diff)
        if hi >= lo:
            J._encode_ac_band(w, J._ENC_AC[t], seqs[i], lo, hi)
    out += w.flush()
    return bytes(out)


def _rand_seqs(rng, n, density=0.2, amp=200):
    seqs = np.zeros((n, 64), dtype=np.int64)
    mask = rng.random((n, 64)) < density
    seqs[mask] = rng.integers(-amp, amp + 1, int(mask.sum()))
    # a few all-zero blocks, a full block, and a trailing-run block
    seqs[0] = 0
    if n > 3:
        seqs[1] = rng.integers(-amp, amp + 1, 64)
        seqs[2, :50] = 0  # long leading zero run -> ZRLs
        seqs[2, 50] = 7
    return seqs


@pytest.mark.parametrize("ri", [0, 1, 3, 8])
@pytest.mark.parametrize("emit_dc,lo,hi", [(True, 1, 63), (True, 0, 0), (False, 1, 63), (False, 5, 20)])
def test_entropy_scan_vec_bit_parity(ri, emit_dc, lo, hi):
    rng = np.random.default_rng(ri * 101 + lo * 7 + hi)
    n = 37
    seqs = _rand_seqs(rng, n)
    # 3-component interleaved-ish pattern with per-block table selectors
    comp = np.arange(n, dtype=np.int64) % 3
    tsel = (comp > 0).astype(np.int64)
    unit = np.arange(n, dtype=np.int64)  # one unit per block
    vec = J._entropy_scan_vec(seqs, tsel, comp, unit, ri, emit_dc, lo, hi)
    ref = _scalar_scan(seqs, tsel, comp, unit, ri, emit_dc, lo, hi)
    assert vec == ref


def test_entropy_scan_vec_parity_mcu_units():
    # interleaved MCU layout: several blocks share one restart unit
    rng = np.random.default_rng(5)
    n = 48  # 8 MCUs x 6 blocks (4:2:0-style 4Y+Cb+Cr)
    seqs = _rand_seqs(rng, n, density=0.35)
    comp = np.tile(np.array([0, 0, 0, 0, 1, 2]), 8).astype(np.int64)
    tsel = (comp > 0).astype(np.int64)
    unit = np.repeat(np.arange(8, dtype=np.int64), 6)
    for ri in (0, 2, 5):
        vec = J._entropy_scan_vec(seqs, tsel, comp, unit, ri, True, 1, 63)
        ref = _scalar_scan(seqs, tsel, comp, unit, ri, True, 1, 63)
        assert vec == ref, f"ri={ri}"


def test_entropy_scan_vec_parity_extreme_magnitudes():
    # top-of-table magnitudes (Annex K: DC categories <= 11, AC <= 10)
    # and stuffed-0xFF-rich streams
    rng = np.random.default_rng(9)
    n = 16
    seqs = np.zeros((n, 64), dtype=np.int64)
    seqs[:, 0] = rng.integers(-1023, 1024, n)
    seqs[:, 1] = -1  # small AC
    seqs[:, 63] = 1023  # max AC magnitude at the band edge
    comp = np.zeros(n, dtype=np.int64)
    tsel = np.zeros(n, dtype=np.int64)
    unit = np.arange(n, dtype=np.int64)
    for ri in (0, 4):
        vec = J._entropy_scan_vec(seqs, tsel, comp, unit, ri, True, 1, 63)
        ref = _scalar_scan(seqs, tsel, comp, unit, ri, True, 1, 63)
        assert vec == ref


def test_progressive_ac_fused_matches_spec_path():
    # r11: the fused progressive AC block decoder must replay the
    # bit-by-bit spec path exactly, including EOBRUN arithmetic
    rng = np.random.default_rng(3)
    n = 64
    seqs = _rand_seqs(rng, n, density=0.15)
    tsel = np.zeros(n, dtype=np.int64)
    comp = np.zeros(n, dtype=np.int64)
    unit = np.arange(n, dtype=np.int64)
    payload = J._entropy_scan_vec(seqs, tsel, comp, unit, 0, False, 1, 63)
    tab = J._decode_tables(J._AC_LUMA_BITS, J._AC_LUMA_VALS)

    def drive(fn):
        reader = J._BitReader(payload, 0)
        out = np.zeros((n, 64), dtype=np.int64)
        eobrun = 0
        for b in range(n):
            if eobrun > 0:
                eobrun -= 1
                continue
            eobrun = fn(reader, tab, out[b])
        return out

    fast = drive(lambda r, t, row: J._decode_block_ac_prog(r, t, row, 1, 63, 0))
    spec = drive(
        lambda r, t, row: J._decode_block_ac_prog_spec(r, t, row, 1, 63, 0)
    )
    assert np.array_equal(fast, spec)
    assert np.array_equal(fast[:, 1:], seqs[:, 1:])
