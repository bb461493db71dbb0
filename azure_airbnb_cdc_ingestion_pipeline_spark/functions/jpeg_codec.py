"""Baseline JPEG codec (encode + decode), stdlib + numpy only.

Closes the VERDICT r3 "pixel decode stubbed" gap for JPEG: a real
codec — DCT/quant/zigzag/Huffman per ITU-T T.81 with the Annex K example
tables. Supported profile (grown r8/r9): 8-bit precision, 1 or 3
components, baseline sequential (interleaved AND per-component
non-interleaved scans) plus progressive Huffman, 4:4:4 / 4:2:2 / 4:2:0
chroma subsampling, restart intervals (DRI/RSTn), EXIF orientation
(APP1 0x0112, both TIFF byte orders — pixels oriented upright, dims
swapped for 5..8). Still outside (raises NotImplementedError) — 12-bit
precision, hierarchical, arithmetic coding — so
`decode_media` can
detect-and-degrade to the SOF header walk (`codecs.jpeg_info`) exactly as
before; malformed bytes raise ValueError so the quarantine channel keeps
working. The numeric kernels (DCT, quantize, color transform) are numpy
matrix ops; only the entropy coder is per-symbol Python — fine for the
Arrow-batch sizes `mapInPandas` feeds it.

Reference parity note: the reference pipeline has no media path at all —
this belongs to the charter's multimodal-column extension
(SURVEY.md §2.9).
"""

from __future__ import annotations

import functools
import struct

import numpy as np

# ITU-T T.81 Annex K.1 example quantization tables (quality ~50)
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)

# zigzag scan order: ZIGZAG[i] = (row, col) of the i-th coefficient.
# Per ITU-T T.81 Figure A.6: odd diagonals run top-right → bottom-left
# (increasing row), even diagonals bottom-left → top-right (increasing
# column), so (0,0),(0,1),(1,0),(2,0),(1,1),(0,2),...
_zz = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
)
ZIGZAG = _zz
_INV_ZIGZAG = np.zeros(64, dtype=np.int64)
for _i, (_r, _c) in enumerate(ZIGZAG):
    _INV_ZIGZAG[_i] = _r * 8 + _c

# Annex K.3 example Huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via T.81 C.2 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_ENC_DC = (_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
           _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
_ENC_AC = (_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
           _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS))

# orthonormal DCT-II matrix: X = C @ x @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)

    def restart(self, m: int) -> None:
        """Byte-align (1-bit padding; a pad byte of 0xFF gets stuffed by
        write) and emit RSTm — T.81 E.2.4. Markers are raw, never
        stuffed."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out.append(0xFF)
        self.out.append(0xD0 + (m & 7))


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H/8, W/8, 8, 8) view of an 8-padded plane."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _encode_dc(writer: _BitWriter, dc_tab: dict, diff: int) -> None:
    s = _category(diff)
    code, ln = dc_tab[s]
    writer.write(code, ln)
    if s:
        writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)


def _encode_ac_band(
    writer: _BitWriter, ac_tab: dict, seq: np.ndarray, lo: int, hi: int
) -> None:
    """Run-length/size encode seq[lo..hi]. With lo=1,hi=63 this is the
    baseline AC coder; a progressive spectral-selection scan (Ah=0) uses
    the identical code stream when EOBRUN is flushed per block (EOB0 ==
    baseline EOB)."""
    run = 0
    nz = np.nonzero(seq[lo : hi + 1])[0]
    last_nz = (nz[-1] + lo) if nz.size else lo - 1
    for i in range(lo, last_nz + 1):
        v = int(seq[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_tab[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < hi:
        code, ln = ac_tab[0x00]  # EOB (== EOBRUN of exactly 1)
        writer.write(code, ln)


def _box_downsample(plane: np.ndarray, fh: int, fv: int) -> np.ndarray:
    """Box-average downsample by (fv, fh), edge-padding odd dims first —
    the standard chroma decimation encoders apply before 4:2:0/4:2:2."""
    h, w = plane.shape
    ph, pw = -(-h // fv) * fv, -(-w // fh) * fh
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // fv, fv, pw // fh, fh).mean(axis=(1, 3))


def _quantized_zigzag(
    plane: np.ndarray, quant: np.ndarray, bh: int, bw: int
) -> np.ndarray:
    """Pad a component plane to (bh·8, bw·8), forward-DCT, quantize,
    zigzag: (bh, bw, 64) int64."""
    h, w = plane.shape
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = _blocks_of(padded) - 128.0
    # forward DCT as two broadcast BLAS matmuls, C @ blk @ C.T — the
    # generic 4-index einsum contraction was the decoder-side profile's
    # top cost (r9); matmul broadcasts over the (bh, bw) leading dims
    coef = _C @ blocks @ _C.T
    qb = np.round(coef / quant).astype(np.int64)
    return qb.reshape(bh, bw, 64)[..., _INV_ZIGZAG]


#: component sampling factors (h, v) per supported subsampling mode
_SUBSAMPLING = {
    "444": ((1, 1), (1, 1), (1, 1)),
    "422": ((2, 1), (1, 1), (1, 1)),
    "420": ((2, 2), (1, 1), (1, 1)),
}


# ---------------------------------------------------------------------------
# vectorized entropy coder (r10 optimization)
# ---------------------------------------------------------------------------
# The per-block Python loops (_encode_dc/_encode_ac_band over a _BitWriter)
# were the encode-side profile's top cost: ~20 ms per 256² 4:2:0 frame,
# dominating the mixed-image corpus synthesis. The kernel below emits the
# BIT-IDENTICAL stream (parity-pinned in tests/test_jpeg_vec.py) from numpy
# arrays: symbol assembly, MSB-first bit packing, byte stuffing and restart
# markers are all whole-scan array ops. The scalar helpers above stay as the
# executable spec the parity test checks against.

def _enc_table_arrays() -> tuple:
    dc_code = np.zeros((2, 17), dtype=np.int64)
    dc_len = np.zeros((2, 17), dtype=np.int64)
    ac_code = np.zeros((2, 256), dtype=np.int64)
    ac_len = np.zeros((2, 256), dtype=np.int64)
    for t in (0, 1):
        for s, (c, ln) in _ENC_DC[t].items():
            dc_code[t, s], dc_len[t, s] = c, ln
        for s, (c, ln) in _ENC_AC[t].items():
            ac_code[t, s], ac_len[t, s] = c, ln
    return dc_code, dc_len, ac_code, ac_len


_VDC_CODE, _VDC_LEN, _VAC_CODE, _VAC_LEN = _enc_table_arrays()
_POW2_17 = (1 << np.arange(17)).astype(np.int64)


def _cat_vec(v: np.ndarray) -> np.ndarray:
    """Vectorized T.81 magnitude category: bit_length(|v|)."""
    return np.searchsorted(_POW2_17, np.abs(v), side="right").astype(np.int64)


def _pack_msb(vals: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """MSB-first pack of (value, bit-length) pairs into bytes, final
    partial byte padded with 1-bits (T.81 F.1.2.3). Values must already
    fit their lengths. Returns uint8 array (unstuffed)."""
    total = int(lens.sum())
    pad = (-total) % 8
    if pad:
        vals = np.append(vals, (1 << pad) - 1)
        lens = np.append(lens, pad)
    ends = np.cumsum(lens)
    offs = ends - lens
    nbytes = (total + pad) // 8
    b0 = offs >> 3
    # ≤ 16-bit code at intra-byte offset ≤ 7 fits a 24-bit window
    w = vals << (24 - (offs & 7) - lens)
    acc = np.zeros(nbytes + 3, dtype=np.int64)
    np.add.at(acc, b0, (w >> 16) & 0xFF)
    np.add.at(acc, b0 + 1, (w >> 8) & 0xFF)
    np.add.at(acc, b0 + 2, w & 0xFF)
    return acc[:nbytes].astype(np.uint8)


def _stuff_ff(buf: np.ndarray) -> bytes:
    """0xFF → 0xFF 0x00 byte stuffing, vectorized."""
    ff = np.flatnonzero(buf == 0xFF)
    if ff.size:
        buf = np.insert(buf, ff + 1, 0)
    return buf.tobytes()


def _entropy_scan_vec(
    seqs: np.ndarray,
    tsel: np.ndarray,
    comp: np.ndarray,
    unit: np.ndarray,
    ri: int,
    emit_dc: bool,
    lo: int,
    hi: int,
) -> bytes:
    """Entropy-code one scan: blocks in scan order as (N, 64) zigzag
    rows, per-block Huffman-table selector / component id / restart-unit
    index. Emits DC diffs (predictors reset per restart segment), the
    AC band [lo, hi] with ZRL/EOB exactly as `_encode_ac_band`, restart
    markers every ``ri`` units, per-segment 1-bit padding and byte
    stuffing — bit-identical to the scalar writer path."""
    n = seqs.shape[0]
    if n == 0:
        return b""
    blk_parts: list[np.ndarray] = []
    key_parts: list[np.ndarray] = []
    val_parts: list[np.ndarray] = []
    len_parts: list[np.ndarray] = []
    seg = (unit // ri) if ri else np.zeros(n, dtype=np.int64)
    if emit_dc:
        dc = seqs[:, 0].astype(np.int64)
        diff = np.empty(n, dtype=np.int64)
        for c in np.unique(comp):
            idx = np.flatnonzero(comp == c)
            d = dc[idx]
            prev = np.concatenate([[0], d[:-1]])
            if ri:
                s_ = seg[idx]
                prev[np.concatenate([[True], s_[1:] != s_[:-1]])] = 0
            diff[idx] = d - prev
        s = _cat_vec(diff)
        blk_parts.append(np.arange(n, dtype=np.int64))
        key_parts.append(np.zeros(n, dtype=np.int64))
        val_parts.append(_VDC_CODE[tsel, s])
        len_parts.append(_VDC_LEN[tsel, s])
        nz = np.flatnonzero(s)
        blk_parts.append(nz)
        key_parts.append(np.ones(nz.size, dtype=np.int64))
        dnz, snz = diff[nz], s[nz]
        val_parts.append(np.where(dnz > 0, dnz, dnz + _POW2_17[snz] - 1))
        len_parts.append(snz)
    if hi >= lo:
        band = seqs[:, lo : hi + 1]
        r, cl = np.nonzero(band)  # row-major: scan order within block
        if r.size:
            v = band[r, cl].astype(np.int64)
            firstb = np.concatenate([[True], r[1:] != r[:-1]])
            prevc = np.where(
                firstb, -1, np.concatenate([[0], cl[:-1]])
            )
            run = cl - prevc - 1
            z, rem = run >> 4, run & 15
            sv = _cat_vec(v)
            sym = (rem.astype(np.int64) << 4) | sv
            abs_c = (cl + lo).astype(np.int64)
            zi = np.flatnonzero(z)
            if zi.size:
                rep = z[zi]
                owner = np.repeat(zi, rep)
                k = np.arange(owner.size, dtype=np.int64) - np.repeat(
                    np.cumsum(rep) - rep, rep
                )
                blk_parts.append(r[owner])
                key_parts.append(abs_c[owner] * 8 + 2 + k)
                tz = tsel[r[owner]]
                val_parts.append(_VAC_CODE[tz, 0xF0])
                len_parts.append(_VAC_LEN[tz, 0xF0])
            tr = tsel[r]
            blk_parts.append(r)
            key_parts.append(abs_c * 8 + 6)
            val_parts.append(_VAC_CODE[tr, sym])
            len_parts.append(_VAC_LEN[tr, sym])
            blk_parts.append(r)
            key_parts.append(abs_c * 8 + 7)
            val_parts.append(np.where(v > 0, v, v + _POW2_17[sv] - 1))
            len_parts.append(sv)
        lastc = np.full(n, -1, dtype=np.int64)
        if r.size:
            lastc[r] = cl  # later rows overwrite: keeps the LAST col
        eob = np.flatnonzero(lastc < hi - lo)
        if eob.size:
            te = tsel[eob]
            blk_parts.append(eob)
            key_parts.append(np.full(eob.size, 8 * 64 + 8, dtype=np.int64))
            val_parts.append(_VAC_CODE[te, 0x00])
            len_parts.append(_VAC_LEN[te, 0x00])
    blk = np.concatenate(blk_parts)
    key = np.concatenate(key_parts)
    val = np.concatenate(val_parts)
    ln = np.concatenate(len_parts)
    if np.any((ln == 0) & (key % 8 != 1) & (key != 1)):
        raise ValueError("JPEG symbol outside the Annex K Huffman tables")
    order = np.lexsort((key, blk))
    val, ln, blk = val[order], ln[order], blk[order]
    keep = ln > 0  # zero-length value fields (category 0) emit nothing
    val, ln, blk = val[keep], ln[keep], blk[keep]
    eseg = seg[blk]
    nseg = int(seg[-1]) + 1 if ri else 1
    out = bytearray()
    rst = 0
    bounds = np.searchsorted(eseg, np.arange(nseg + 1))
    for si in range(nseg):
        a, b = bounds[si], bounds[si + 1]
        out += _stuff_ff(_pack_msb(val[a:b], ln[a:b]))
        if si < nseg - 1:
            out += bytes((0xFF, 0xD0 + (rst & 7)))
            rst = (rst + 1) & 7
    return bytes(out)


def encode_jpeg(
    width: int, height: int, channels: int, pixels: bytes,
    progressive: bool = False,
    subsampling: str = "444",
    restart_interval: int = 0,
    interleave: bool = True,
    exif_orientation: int = 0,
) -> bytes:
    """Sequential-baseline (SOF0) or progressive (SOF2, spectral
    selection only: one interleaved DC scan then one full-band AC scan
    per component) JPEG from raw 8-bit pixels (row-major, interleaved
    for 3-channel RGB). Quality is fixed at the Annex K tables (~50).

    r8 (VERDICT r7 #1): `subsampling` ∈ {"444", "422", "420"} — 4:2:0
    and 4:2:2 box-decimate the chroma planes and emit the interleaved
    MCU scan layout (Y blocks raster-ordered within each MCU, then Cb,
    then Cr) so the test corpus can exercise the dominant web-JPEG
    profile. Subsampled encode is baseline-sequential only.

    r9 (VERDICT r8 #2): ``restart_interval`` > 0 emits a DRI segment
    and RSTm markers every that-many MCUs (blocks, for non-interleaved
    scans) per T.81 E.2.4 — DC predictors reset, marker index cycles
    0-7, no marker after a scan's last MCU — so the test corpus can
    synthesize the restart-carrying profile most camera/CDN JPEGs use.

    ``interleave=False`` (baseline only) emits one FULL-BAND scan per
    component over its own extent grid (T.81 A.2.2) instead of the
    single interleaved-MCU scan — the non-interleaved baseline layout
    some encoders produce for 3-component images, closing the last
    baseline decode-profile hole (r9).

    ``exif_orientation`` ∈ 1..8 writes an APP1 Exif segment (big-endian
    TIFF, IFD0 with the single 0x0112 SHORT tag) so the corpus can
    synthesize camera-style rotated payloads; 0 writes no APP1."""
    if channels not in (1, 3):
        raise NotImplementedError("encode_jpeg supports 1 or 3 channels")
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise ValueError("restart_interval must be in [0, 65535]")
    if exif_orientation not in range(0, 9):
        raise ValueError("exif_orientation must be 0 (none) or 1..8")
    if subsampling not in _SUBSAMPLING:
        raise NotImplementedError(f"unsupported subsampling {subsampling!r}")
    if subsampling != "444" and channels != 3:
        subsampling = "444"  # grayscale has no chroma to subsample
    arr = np.frombuffer(pixels, dtype=np.uint8)
    if arr.size != width * height * channels:
        raise ValueError("pixel buffer does not match width*height*channels")
    arr = arr.reshape(height, width, channels).astype(np.float64)
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        comps = [arr[..., 0]]
    samp = _SUBSAMPLING[subsampling][:channels]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    quants = [QUANT_LUMA] + [QUANT_CHROMA] * (channels - 1)
    # MCU grid; per-component block grids are (mcuy·v, mcux·h)
    mcux, mcuy = -(-width // (8 * hmax)), -(-height // (8 * vmax))

    qseq = []
    for ci, comp in enumerate(comps):
        hi, vi = samp[ci]
        if (hi, vi) != (hmax, vmax):
            comp = _box_downsample(comp, hmax // hi, vmax // vi)
        qseq.append(_quantized_zigzag(comp, quants[ci], mcuy * vi, mcux * hi))
    ph, pw = mcuy * vmax * 8, mcux * hmax * 8

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tid: int, q: np.ndarray) -> bytes:
        zz = q.reshape(64)[_INV_ZIGZAG].astype(np.uint8)
        return seg(0xDB, bytes([tid]) + zz.tobytes())

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(
            0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        )

    sof_body = struct.pack(">BHHB", 8, height, width, channels)
    for ci in range(channels):
        tq = 0 if ci == 0 else 1
        hi, vi = samp[ci]
        sof_body += bytes([ci + 1, (hi << 4) | vi, tq])

    out = b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    if exif_orientation:
        # APP1 Exif: "Exif\0\0" + big-endian TIFF header + IFD0 holding
        # exactly the 0x0112 SHORT orientation tag (value left-justified
        # in the 4-byte field per TIFF 6.0), next-IFD offset 0
        tiff = (
            b"MM\x00\x2a" + struct.pack(">I", 8)
            + struct.pack(">H", 1)
            + struct.pack(">HHI", 0x0112, 3, 1)
            + struct.pack(">HH", exif_orientation, 0)
            + struct.pack(">I", 0)
        )
        out += seg(0xE1, b"Exif\x00\x00" + tiff)
    out += dqt(0, QUANT_LUMA)
    if channels == 3:
        out += dqt(1, QUANT_CHROMA)
    out += seg(0xC2 if progressive else 0xC0, sof_body)
    out += dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if channels == 3:
        out += dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    ri = restart_interval
    if ri:
        out += seg(0xDD, struct.pack(">H", ri))

    bh, bw = ph // 8, pw // 8
    if not progressive and not interleave:
        # one full-band scan per component over its OWN extent grid
        # (T.81 A.2.2) — the non-interleaved baseline layout
        for ci in range(channels):
            tsel = 0 if ci == 0 else 1
            hi, vi = samp[ci]
            nbh = -(-(-(-(height * vi) // vmax)) // 8)
            nbw = -(-(-(-(width * hi) // hmax)) // 8)
            sos_body = bytes([1, ci + 1, (tsel << 4) | tsel])
            sos_body += bytes([0, 63, 0])
            nb = nbh * nbw
            out += seg(0xDA, sos_body) + _entropy_scan_vec(
                qseq[ci][:nbh, :nbw].reshape(nb, 64),
                np.full(nb, tsel, dtype=np.int64),
                np.zeros(nb, dtype=np.int64),
                np.arange(nb, dtype=np.int64),  # restart unit = block
                ri,
                True,
                1,
                63,
            )
        out += b"\xff\xd9"  # EOI
        return out
    # interleaved MCU scan order (T.81 A.2.3): per MCU, each component
    # contributes its h×v blocks raster-ordered; built as arrays once
    # and fed to the vectorized entropy coder
    def _interleaved_arrays():
        sp, tp, cp, mp, kp = [], [], [], [], []
        for ci in range(channels):
            hi, vi = samp[ci]
            my, byy, mx, bxx = np.indices((mcuy, vi, mcux, hi))
            rows = (my * vi + byy).ravel()
            cols = (mx * hi + bxx).ravel()
            sp.append(qseq[ci][rows, cols])
            tp.append(np.full(rows.size, 0 if ci == 0 else 1, dtype=np.int64))
            cp.append(np.full(rows.size, ci, dtype=np.int64))
            mp.append((my * mcux + mx).ravel().astype(np.int64))
            kp.append((byy * hi + bxx).ravel().astype(np.int64))
        seqs = np.concatenate(sp)
        tsel = np.concatenate(tp)
        comp = np.concatenate(cp)
        mcu = np.concatenate(mp)
        sub = np.concatenate(kp)
        o = np.lexsort((sub, comp, mcu))
        return seqs[o], tsel[o], comp[o], mcu[o]

    if not progressive:
        sos_body = bytes([channels])
        for ci in range(channels):
            tq = 0 if ci == 0 else 1
            sos_body += bytes([ci + 1, (tq << 4) | tq])
        sos_body += bytes([0, 63, 0])
        seqs, tsel, comp, mcu = _interleaved_arrays()
        out += seg(0xDA, sos_body) + _entropy_scan_vec(
            seqs, tsel, comp, mcu, ri, True, 1, 63
        )
    else:
        # scan 1: interleaved DC-only (Ss=0, Se=0, Ah=0, Al=0) in MCU
        # order — h×v blocks per component per MCU (r8: subsumes the
        # old per-block 4:4:4 interleave, so progressive+subsampled
        # encodes are now legal too)
        sos_body = bytes([channels])
        for ci in range(channels):
            tsel = 0 if ci == 0 else 1
            sos_body += bytes([ci + 1, tsel << 4])
        sos_body += bytes([0, 0, 0])
        seqs, tsel, comp, mcu = _interleaved_arrays()
        out += seg(0xDA, sos_body) + _entropy_scan_vec(
            seqs, tsel, comp, mcu, ri, True, 1, 0  # DC only: empty band
        )
        # one spectral-selection AC scan per component (Ss=1, Se=63):
        # per-block EOB0 keeps the stream baseline-shaped. Single-
        # component scans cover only the component's OWN extent grid
        # (T.81 A.2.2), not the MCU-padded grid.
        for ci in range(channels):
            tsel = 0 if ci == 0 else 1
            hi, vi = samp[ci]
            nbh = -(-(-(-(height * vi) // vmax)) // 8)
            nbw = -(-(-(-(width * hi) // hmax)) // 8)
            sos_body = bytes([1, ci + 1, tsel]) + bytes([1, 63, 0])
            nb = nbh * nbw
            # non-interleaved scan: the restart unit is one BLOCK
            out += seg(0xDA, sos_body) + _entropy_scan_vec(
                qseq[ci][:nbh, :nbw].reshape(nb, 64),
                np.full(nb, tsel, dtype=np.int64),
                np.zeros(nb, dtype=np.int64),
                np.arange(nb, dtype=np.int64),
                ri,
                False,
                1,
                63,
            )
    out += b"\xff\xd9"  # EOI
    return out


class NoScanData(ValueError):
    """Structurally valid JPEG headers but no SOS/entropy data — the
    detect-and-degrade case (header-only artifacts), NOT corruption.
    Callers fall back to the SOF header walk instead of quarantining."""


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.buf
        if self.pos >= len(b):
            raise ValueError("truncated JPEG scan data")
        byte = b[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(b):
                raise ValueError("truncated JPEG scan data")
            nxt = b[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed
            elif nxt == 0xD9:  # EOI reached mid-read
                raise ValueError("truncated JPEG scan data (EOI)")
            elif 0xD0 <= nxt <= 0xD7:
                # a restart marker is only legal at an MCU boundary the
                # decode loop expects (restart_align) — mid-block it
                # means the entropy data is short: corruption, not an
                # unsupported profile (r9: DRI/RSTn are now decoded)
                raise ValueError(
                    "malformed JPEG: restart marker inside an MCU"
                )
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        # mask consumed bits away BEFORE shifting (r9): without it acc
        # accumulates every byte ever read as an ever-growing bigint and
        # the per-fill shift turns quadratic in scan length
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | byte
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        # batch extraction (r9): one shift/mask instead of n bit() calls;
        # _fill keeps the exact marker/truncation error semantics
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def try_fill16(self) -> None:
        """Best-effort fill to ≥ 16 buffered bits for the LUT fast path
        — NON-consuming at boundaries: stops (instead of raising) at a
        marker or end-of-buffer so the caller can fall back to the
        bit-by-bit reader, which preserves the exact error semantics."""
        b, n = self.buf, len(self.buf)
        while self.nbits < 16:
            p = self.pos
            if p >= n:
                return
            byte = b[p]
            if byte == 0xFF:
                if p + 1 >= n or b[p + 1] != 0x00:
                    return  # marker / truncation — slow path decides
                self.pos = p + 2
            else:
                self.pos = p + 1
            self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | byte
            self.nbits += 8

    def restart_align(self, expect: int) -> None:
        """Consume an RSTm at a restart boundary (T.81 E.2.4): discard
        bits to the byte boundary, skip a stuffed 0xFF00 pad byte (a
        1-bit-padded final byte can itself be 0xFF), then require the
        marker with the expected cyclic index — anything else is
        corruption, raised loudly (no resync heuristics)."""
        self.acc = 0
        self.nbits = 0
        b, n = self.buf, len(self.buf)
        while self.pos + 1 < n and b[self.pos] == 0xFF and b[self.pos + 1] == 0x00:
            self.pos += 2
        if self.pos + 1 >= n or b[self.pos] != 0xFF:
            raise ValueError("malformed JPEG: expected restart marker")
        m = b[self.pos + 1]
        if not (0xD0 <= m <= 0xD7):
            raise ValueError("malformed JPEG: expected restart marker")
        if (m - 0xD0) != (expect & 7):
            raise ValueError("malformed JPEG: restart marker out of sequence")
        self.pos += 2


@functools.lru_cache(maxsize=64)
def _tables_cached(bits_b: bytes, vals_b: bytes):
    """(prefix dict, 16-bit LUT) for one Huffman spec. The LUT maps every
    16-bit lookahead to (symbol, code length) — ONE probe per symbol vs
    up to 16 bit-by-bit dict probes (r9: the symbol loop dominated the
    Python decode wall). Cached by spec bytes: a corpus re-using the
    Annex K tables builds each LUT once per process."""
    codes = _canonical_codes(list(bits_b), list(vals_b))
    dec = {v: k for k, v in codes.items()}
    lut: list = [None] * 65536
    for sym, (code, ln) in codes.items():
        base = code << (16 - ln)
        span = 1 << (16 - ln)
        lut[base : base + span] = [(sym, ln)] * span
    return dec, lut


def _decode_tables(bits: list[int], vals: list[int]):
    return _tables_cached(bytes(bits), bytes(vals))


def _read_symbol(reader: _BitReader, table) -> int:
    dec, lut = table
    if reader.nbits < 16:
        reader.try_fill16()
    if reader.nbits >= 16:
        ent = lut[(reader.acc >> (reader.nbits - 16)) & 0xFFFF]
        if ent is None:
            raise ValueError("invalid Huffman code in JPEG scan")
        reader.nbits -= ent[1]
        return ent[0]
    # near a marker / end of buffer: bit-by-bit keeps the exact
    # truncation error semantics (try_fill16 never consumes boundaries)
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.bit()
        length += 1
        sym = dec.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, s: int) -> int:
    return v - ((1 << s) - 1) if v < (1 << (s - 1)) else v


def _exif_orientation(app1_body: bytes) -> int:
    """Orientation (1..8) from an APP1 Exif body, or 0 when absent /
    unparseable. Walks IFD0 of the TIFF stream (both byte orders) for
    the 0x0112 SHORT tag; a malformed Exif blob is metadata, not image
    corruption — degrade to 0 rather than raising (the pixels decode
    fine without it)."""
    try:
        if not app1_body.startswith(b"Exif\x00\x00"):
            return 0
        t = app1_body[6:]
        if t[:2] == b"MM":
            end = ">"
        elif t[:2] == b"II":
            end = "<"
        else:
            return 0
        if struct.unpack(end + "H", t[2:4])[0] != 0x2A:
            return 0
        ifd = struct.unpack(end + "I", t[4:8])[0]
        n = struct.unpack(end + "H", t[ifd : ifd + 2])[0]
        for k in range(n):
            e = t[ifd + 2 + 12 * k : ifd + 14 + 12 * k]
            tag, typ, cnt = struct.unpack(end + "HHI", e[:8])
            if tag == 0x0112 and typ == 3 and cnt == 1:
                v = struct.unpack(end + "H", e[8:10])[0]
                return v if 1 <= v <= 8 else 0
        return 0
    except (struct.error, IndexError):
        return 0


def _apply_orientation(img: dict, orientation: int) -> dict:
    """Rotate/flip decoded pixels upright per the EXIF orientation tag
    (1 = as stored). Dims swap for 5..8; mean intensity is invariant."""
    if orientation in (0, 1):
        return img
    h, w, c = img["height"], img["width"], img["channels"]
    a = np.frombuffer(img["pixels"], dtype=np.uint8).reshape(h, w, c)
    if orientation == 2:
        a = a[:, ::-1]
    elif orientation == 3:
        a = a[::-1, ::-1]
    elif orientation == 4:
        a = a[::-1, :]
    elif orientation == 5:  # transpose (main diagonal)
        a = a.transpose(1, 0, 2)
    elif orientation == 6:  # rotate 90° CW to display upright
        a = np.rot90(a, k=-1, axes=(0, 1))
    elif orientation == 7:  # transverse (anti-diagonal)
        a = a.transpose(1, 0, 2)[::-1, ::-1]
    elif orientation == 8:  # rotate 90° CCW
        a = np.rot90(a, k=1, axes=(0, 1))
    a = np.ascontiguousarray(a)
    out = dict(img)
    out["height"], out["width"] = a.shape[0], a.shape[1]
    out["pixels"] = a.tobytes()
    return out


def _decode_block_from(
    reader: _BitReader, dc_tab: dict, ac_tab: dict, seq, prev_dc: int, k: int
) -> int:
    """Bit-by-bit sequential block decode starting at coefficient ``k``
    (0 = DC pending) — the executable spec, and the boundary fallback
    of the fused fast loop below: exact marker/truncation semantics via
    the _BitReader's guarded fills."""
    if k == 0:
        s = _read_symbol(reader, dc_tab)
        diff = _extend(reader.bits(s), s) if s else 0
        prev_dc += diff
        seq[0] = prev_dc
        k = 1
    while k < 64:
        rs = _read_symbol(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("malformed JPEG: AC index overrun")
        seq[k] = _extend(reader.bits(s), s)
        k += 1
    return prev_dc


def _decode_block_seq(
    reader: _BitReader, dc_tab: dict, ac_tab: dict, seq, prev_dc: int
) -> int:
    """Full-band sequential block decode (DC diff + RLE AC) into the
    zigzag-order store ``seq``; returns the updated DC predictor.

    r10 (guide §4.2 — per-task work): the symbol loop is fused with the
    bit reader. Reader state lives in locals, the buffer is filled to
    ≥ 32 bits at a time (a code ≤ 16 bits plus its magnitude ≤ 15 bits
    always fit, so each coefficient is ONE lut probe + shifts with no
    per-symbol function calls), and the moment a fill stops short — a
    marker or end-of-buffer, exactly where try_fill16 stops — state is
    synced back and the block finishes on the bit-by-bit spec path
    above, preserving its exact error semantics. Decoded streams are
    bit-identical (roundtrip + profile-matrix tests)."""
    buf = reader.buf
    n = len(buf)
    acc, nbits, pos = reader.acc, reader.nbits, reader.pos
    lut_dc, lut_ac = dc_tab[1], ac_tab[1]
    k = 0
    while k < 64:
        if nbits < 32:
            while nbits < 32:
                if pos >= n:
                    break
                byte = buf[pos]
                if byte == 0xFF:
                    if pos + 1 >= n or buf[pos + 1] != 0x00:
                        break  # marker / truncation — spec path decides
                    pos += 2
                else:
                    pos += 1
                acc = ((acc & ((1 << nbits) - 1)) << 8) | byte
                nbits += 8
            if nbits < 32:
                reader.acc, reader.nbits, reader.pos = acc, nbits, pos
                return _decode_block_from(
                    reader, dc_tab, ac_tab, seq, prev_dc, k
                )
        if k == 0:
            ent = lut_dc[(acc >> (nbits - 16)) & 0xFFFF]
            if ent is None:
                raise ValueError("invalid Huffman code in JPEG scan")
            s = ent[0]
            nbits -= ent[1]
            if s:
                nbits -= s
                v = (acc >> nbits) & ((1 << s) - 1)
                prev_dc += (v - ((1 << s) - 1)) if v < (1 << (s - 1)) else v
            seq[0] = prev_dc
            k = 1
        else:
            ent = lut_ac[(acc >> (nbits - 16)) & 0xFFFF]
            if ent is None:
                raise ValueError("invalid Huffman code in JPEG scan")
            rs = ent[0]
            nbits -= ent[1]
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("malformed JPEG: AC index overrun")
            nbits -= s
            v = (acc >> nbits) & ((1 << s) - 1)
            seq[k] = (v - ((1 << s) - 1)) if v < (1 << (s - 1)) else v
            k += 1
    reader.acc, reader.nbits, reader.pos = acc, nbits, pos
    return prev_dc


def _decode_block_ac_prog_spec(reader: _BitReader, tab, row, k: int, se, al) -> int:
    """Bit-by-bit progressive AC (spectral selection, Ah=0) block decode
    from coefficient ``k`` — the executable spec and the boundary
    fallback of the fused loop below. Returns the EOBRUN remaining
    AFTER this block (0 when the band completed without an EOB)."""
    while k <= se:
        rs = _read_symbol(reader, tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("malformed JPEG: AC index overrun")
        row[k] = _extend(reader.bits(s), s) << al
        k += 1
    return 0


def _decode_block_ac_prog(reader: _BitReader, tab, row, ss, se, al) -> int:
    """Fused progressive AC (spectral selection, Ah=0) block decode —
    the r11 fused-LUT treatment of the last per-symbol Python scan loop
    (r10 fused the sequential one, `_decode_block_seq`). Reader state in
    locals, buffer filled to ≥ 32 bits (code ≤ 16 + magnitude/EOB-run
    bits ≤ 15 always fit → one LUT probe + shifts per symbol); the
    moment a fill stops short — marker or end-of-buffer, exactly where
    try_fill16 stops — state syncs back and the block finishes on the
    bit-by-bit spec path above, preserving exact error semantics.
    Returns the EOBRUN remaining after this block."""
    lut = tab[1]
    buf = reader.buf
    n = len(buf)
    acc, nbits, pos = reader.acc, reader.nbits, reader.pos
    k = ss
    while k <= se:
        if nbits < 32:
            while nbits < 32:
                if pos >= n:
                    break
                byte = buf[pos]
                if byte == 0xFF:
                    if pos + 1 >= n or buf[pos + 1] != 0x00:
                        break  # marker / truncation — spec path decides
                    pos += 2
                else:
                    pos += 1
                acc = ((acc & ((1 << nbits) - 1)) << 8) | byte
                nbits += 8
            if nbits < 32:
                reader.acc, reader.nbits, reader.pos = acc, nbits, pos
                return _decode_block_ac_prog_spec(reader, tab, row, k, se, al)
        ent = lut[(acc >> (nbits - 16)) & 0xFFFF]
        if ent is None:
            raise ValueError("invalid Huffman code in JPEG scan")
        rs = ent[0]
        nbits -= ent[1]
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                nbits -= r
                eobrun += (acc >> nbits) & ((1 << r) - 1)
            reader.acc, reader.nbits, reader.pos = acc, nbits, pos
            return eobrun
        k += r
        if k > se:
            raise ValueError("malformed JPEG: AC index overrun")
        nbits -= s
        v = (acc >> nbits) & ((1 << s) - 1)
        row[k] = ((v - ((1 << s) - 1)) if v < (1 << (s - 1)) else v) << al
        k += 1
    reader.acc, reader.nbits, reader.pos = acc, nbits, pos
    return 0


def _skip_entropy(buf: bytes, pos: int) -> int:
    """Advance past entropy-coded data to the next real marker (skipping
    stuffed 0xFF00 and restart markers)."""
    n = len(buf)
    while pos + 1 < n:
        if buf[pos] == 0xFF:
            nxt = buf[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return n


def _idct_to_image(
    coef: list[np.ndarray],
    comps: list[tuple],
    quant: dict[int, np.ndarray],
    h: int,
    w: int,
    hmax: int,
    vmax: int,
) -> dict:
    """Shared reconstruction tail: zigzag→natural reorder, dequantize,
    batched-einsum IDCT, crop each component to its true extent
    (ceil(dim·factor/max)), bilinear-upsample subsampled planes to frame
    size, color-transform. ``coef`` holds per-component zigzag-order
    stores on the full MCU-padded block grid."""
    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        if tq not in quant:
            raise ValueError("malformed JPEG: missing quant table")
        gh, gw = coef[ci].shape[:2]
        natural = np.zeros((gh, gw, 64), dtype=np.float64)
        natural[..., _INV_ZIGZAG] = coef[ci]
        blk = natural.reshape(gh, gw, 8, 8) * quant[tq]
        # inverse DCT: C.T @ blk @ C as broadcast matmuls (see encoder)
        px = _C.T @ blk @ _C + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(gh * 8, gw * 8)
        ch = -(-(h * vi) // vmax)
        cw = -(-(w * hi) // hmax)
        plane = plane[:ch, :cw]
        if (ch, cw) != (h, w):
            from .phash import bilinear_resize  # shared resample kernel

            plane = bilinear_resize(plane, h, w)
        planes.append(plane)
    return _to_image(planes, h, w)


def _to_image(planes: list[np.ndarray], h: int, w: int) -> dict:
    """YCbCr→RGB (or passthrough gray), crop to (h, w), package result."""
    nch = len(planes)
    if nch == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        img = np.stack([r, g, b], axis=-1)
    else:
        img = planes[0][..., None]
    img = np.clip(np.round(img[:h, :w]), 0, 255).astype(np.uint8)
    return {
        "width": w,
        "height": h,
        "channels": nch,
        "pixels": img.tobytes(),
        "mean_intensity": float(img.mean()),
    }


def _decode_progressive(
    payload: bytes,
    frame: tuple,
    quant: dict[int, np.ndarray],
    scans: list[tuple],
) -> dict:
    """Progressive (SOF2) reconstruction: DC first + DC refinement scans
    and spectral-selection AC scans (Ah=0) are decoded exactly; AC
    successive-approximation refinement scans are skipped (coefficients
    stay at their coarser approximation — a fidelity degrade, never a
    layout error)."""
    h, w, comps = frame  # [(cid, hi, vi, tq)]
    hmax = max(hi for _cid, hi, _vi, _tq in comps)
    vmax = max(vi for _cid, _hi, vi, _tq in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    nch = len(comps)
    comp_idx = {cid: k for k, (cid, _hi, _vi, _tq) in enumerate(comps)}
    samp_of = {cid: (hi, vi) for cid, hi, vi, _tq in comps}
    # per-component geometry: the FULL MCU-padded grid (interleaved DC
    # scans cover it) and the NON-INTERLEAVED grid over the component's
    # own extent (single-component scans cover only ceil(dim/8) blocks —
    # T.81 A.2.2; the MCU padding blocks simply keep zero AC there)
    full_grid, sub_grid, extent = [], [], []
    for _cid, hi, vi, _tq in comps:
        full_grid.append((mcuy * vi, mcux * hi))
        ch = -(-(h * vi) // vmax)
        cw = -(-(w * hi) // hmax)
        extent.append((ch, cw))
        sub_grid.append((-(-ch // 8), -(-cw // 8)))
    # zigzag-order coefficient store per component (full grid)
    coef = [
        np.zeros((gh, gw, 64), dtype=np.int64) for gh, gw in full_grid
    ]
    for scomps, ss, se, ah, al, start, dc_tabs, ac_tabs, ri in scans:
        reader = _BitReader(payload, start)
        rst = 0  # cyclic RSTm index; ri counts MCUs (blocks when
        #          non-interleaved) per T.81 E.2.4
        if ss == 0:
            if se != 0:
                raise ValueError(
                    "malformed JPEG: progressive DC scan with Se != 0"
                )
            idxs = [comp_idx[cid] for cid, _td, _ta in scomps]
            interleaved = len(scomps) > 1
            if ah == 0:
                prev = [0] * len(scomps)
                if interleaved:  # MCU order, h×v blocks per component
                    done = 0
                    for my in range(mcuy):
                        for mx in range(mcux):
                            if ri and done and done % ri == 0:
                                reader.restart_align(rst)
                                rst = (rst + 1) & 7
                                prev = [0] * len(scomps)
                            done += 1
                            for k, (cid, td, _ta) in enumerate(scomps):
                                if td not in dc_tabs:
                                    raise ValueError(
                                        "malformed JPEG: missing DC table"
                                    )
                                hi, vi = samp_of[cid]
                                for byy in range(vi):
                                    for bxx in range(hi):
                                        s = _read_symbol(reader, dc_tabs[td])
                                        diff = (
                                            _extend(reader.bits(s), s)
                                            if s else 0
                                        )
                                        prev[k] += diff
                                        coef[idxs[k]][
                                            my * vi + byy, mx * hi + bxx, 0
                                        ] = prev[k] << al
                else:  # single component: raster over its own sub-grid
                    cid, td, _ta = scomps[0]
                    if td not in dc_tabs:
                        raise ValueError("malformed JPEG: missing DC table")
                    ci = idxs[0]
                    nbh, nbw = sub_grid[ci]
                    done = 0
                    for by in range(nbh):
                        for bx in range(nbw):
                            if ri and done and done % ri == 0:
                                reader.restart_align(rst)
                                rst = (rst + 1) & 7
                                prev[0] = 0
                            done += 1
                            s = _read_symbol(reader, dc_tabs[td])
                            diff = _extend(reader.bits(s), s) if s else 0
                            prev[0] += diff
                            coef[ci][by, bx, 0] = prev[0] << al
            else:
                # DC refinement: one raw bit per block in the SAME block
                # order as the first scan; plain addition is correct
                # under T.81's arithmetic-shift approximation
                if interleaved:
                    done = 0
                    for my in range(mcuy):
                        for mx in range(mcux):
                            if ri and done and done % ri == 0:
                                reader.restart_align(rst)
                                rst = (rst + 1) & 7
                            done += 1
                            for k, (cid, _td, _ta) in enumerate(scomps):
                                hi, vi = samp_of[cid]
                                for byy in range(vi):
                                    for bxx in range(hi):
                                        if reader.bit():
                                            coef[idxs[k]][
                                                my * vi + byy,
                                                mx * hi + bxx, 0,
                                            ] += 1 << al
                else:
                    ci = idxs[0]
                    nbh, nbw = sub_grid[ci]
                    done = 0
                    for by in range(nbh):
                        for bx in range(nbw):
                            if ri and done and done % ri == 0:
                                reader.restart_align(rst)
                                rst = (rst + 1) & 7
                            done += 1
                            if reader.bit():
                                coef[ci][by, bx, 0] += 1 << al
        else:
            if len(scomps) != 1:
                raise ValueError(
                    "malformed JPEG: progressive AC scan must be "
                    "single-component"
                )
            if se > 63 or ss > se:
                raise ValueError("malformed JPEG: bad spectral band")
            if ah != 0:
                continue  # AC refinement: degrade (skip this scan)
            cid, _td, ta = scomps[0]
            ci = comp_idx[cid]
            if ta not in ac_tabs:
                raise ValueError("malformed JPEG: missing AC table")
            tab = ac_tabs[ta]
            nbh, nbw = sub_grid[ci]
            eobrun = 0
            done = 0
            for by in range(nbh):
                for bx in range(nbw):
                    if ri and done and done % ri == 0:
                        reader.restart_align(rst)
                        rst = (rst + 1) & 7
                        eobrun = 0  # EOBRUN cannot span a restart
                    done += 1
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    eobrun = _decode_block_ac_prog(
                        reader, tab, coef[ci][by, bx], ss, se, al
                    )
    return _idct_to_image(
        [c.astype(np.float64) for c in coef], comps, quant, h, w, hmax, vmax
    )


def _decode_baseline_scans(
    payload: bytes,
    frame: tuple,
    quant: dict[int, np.ndarray],
    scans: list[tuple],
) -> dict:
    """Multi-scan SEQUENTIAL (SOF0) decode — r9, the last baseline
    profile hole: T.81 allows a baseline frame to split its components
    across several full-band scans (ns=1 non-interleaved scans raster
    the component's OWN extent grid per A.2.2; ns>1 subsets interleave
    by MCU). Every scan must be full-band (Ss=0, Se=63, Ah=Al=0) and
    each component scanned exactly once — anything else is malformed,
    raised loudly."""
    h, w, comps = frame
    hmax = max(hi for _cid, hi, _vi, _tq in comps)
    vmax = max(vi for _cid, _hi, vi, _tq in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    comp_idx = {cid: k for k, (cid, _hi, _vi, _tq) in enumerate(comps)}
    samp_of = {cid: (hi, vi) for cid, hi, vi, _tq in comps}
    sub_grid = []
    for _cid, hi, vi, _tq in comps:
        ch = -(-(h * vi) // vmax)
        cw = -(-(w * hi) // hmax)
        sub_grid.append((-(-ch // 8), -(-cw // 8)))
    coef = [
        np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.float64)
        for _cid, hi, vi, _tq in comps
    ]
    covered: set[int] = set()
    for scomps, ss, se, ah, al, start, dc_tabs, ac_tabs, ri in scans:
        if (ss, se, ah, al) != (0, 63, 0, 0):
            raise ValueError(
                "malformed JPEG: baseline scan must be full-band"
            )
        for cid, td, ta in scomps:
            if td not in dc_tabs or ta not in ac_tabs:
                raise ValueError("malformed JPEG: missing table for scan")
            if cid in covered:
                raise ValueError(
                    "malformed JPEG: component scanned twice in baseline"
                )
            covered.add(cid)
        reader = _BitReader(payload, start)
        rst = 0
        if len(scomps) > 1:  # interleaved subset: MCU order
            prev = [0] * len(scomps)
            done = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if ri and done and done % ri == 0:
                        reader.restart_align(rst)
                        rst = (rst + 1) & 7
                        prev = [0] * len(scomps)
                    done += 1
                    for k, (cid, td, ta) in enumerate(scomps):
                        ci = comp_idx[cid]
                        hi, vi = samp_of[cid]
                        for byy in range(vi):
                            for bxx in range(hi):
                                prev[k] = _decode_block_seq(
                                    reader, dc_tabs[td], ac_tabs[ta],
                                    coef[ci][my * vi + byy, mx * hi + bxx],
                                    prev[k],
                                )
        else:  # non-interleaved: raster over the component's sub-grid
            cid, td, ta = scomps[0]
            ci = comp_idx[cid]
            nbh, nbw = sub_grid[ci]
            prev0 = 0
            done = 0
            for by in range(nbh):
                for bx in range(nbw):
                    if ri and done and done % ri == 0:
                        reader.restart_align(rst)
                        rst = (rst + 1) & 7
                        prev0 = 0
                    done += 1
                    prev0 = _decode_block_seq(
                        reader, dc_tabs[td], ac_tabs[ta],
                        coef[ci][by, bx], prev0,
                    )
    if covered != set(comp_idx):
        raise ValueError(
            "malformed JPEG: baseline scans do not cover every component"
        )
    return _idct_to_image(coef, comps, quant, h, w, hmax, vmax)


def decode_jpeg(payload: bytes) -> dict:
    """Decode a JPEG within the supported profile: 8-bit, 1 or 3
    components; baseline sequential (SOF0) AND progressive (SOF2) —
    both INCLUDING chroma-subsampled 4:2:0 / 4:2:2 interleaved-MCU
    layouts (r8, the dominant web profiles; bilinear chroma upsample;
    single-component scans cover the component's own extent grid per
    T.81 A.2.2) and restart intervals (r9, VERDICT r8 #2: DRI honored,
    DC predictors / EOBRUN reset and bit-alignment at each RSTn per
    T.81 E.2.4, cyclic marker index verified — out-of-sequence markers
    raise loudly rather than resync). Progressive decodes DC
    first/refinement scans plus spectral-selection AC scans (Ah=0)
    exactly; AC successive-approximation refinement scans are skipped,
    degrading to a coarser (never wrong-layout) image. Baseline frames
    may split their components across full-band scans (non-interleaved
    per T.81 A.2.2 — r9); EXIF orientation is parsed from APP1 and
    applied so pixels come back upright with dims swapped for
    orientations 5..8 (r9; malformed Exif degrades to unrotated — the
    tag is metadata, not image corruption). Returns {width, height,
    channels, pixels (bytes, RGB/gray row-major), mean_intensity}.
    ValueError on malformed bytes; NotImplementedError on
    valid-but-unsupported profiles (12-bit, hierarchical, arithmetic
    coding) so callers degrade to the header walk."""
    if payload is None or not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload (bad SOI marker)")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, [(cid, hi, vi, tq)])
    progressive = False
    scan_comps = None
    orientation = 0  # EXIF 0x0112 from APP1, 0 = none/unparseable
    restart_interval = 0  # DRI in effect (0 = none); per-scan snapshot
    # progressive scans:
    # (comps, Ss, Se, Ah, Al, data_start, dc_tabs, ac_tabs, ri)
    scans: list[tuple] = []
    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError(f"malformed JPEG: expected marker at {i}")
        marker = payload[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        if i + 4 > n:
            raise ValueError("malformed JPEG: truncated segment header")
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        if seg_len < 2:
            raise ValueError("malformed JPEG: segment length < 2")
        body = payload[i + 4 : i + 2 + seg_len]
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                      0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0) and progressive Huffman (SOF2) "
                "JPEG supported"
            )
        if marker == 0xDD:
            if len(body) < 2:
                raise ValueError("malformed JPEG: truncated DRI segment")
            restart_interval = struct.unpack(">H", body[:2])[0]
            i += 2 + seg_len
            continue
        if marker == 0xE1 and not orientation:
            orientation = _exif_orientation(body)
            i += 2 + seg_len
            continue
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit DQT not supported")
                if j + 65 > len(body):
                    raise ValueError("malformed JPEG: truncated DQT")
                zz = np.frombuffer(body[j + 1 : j + 65], dtype=np.uint8)
                q = np.zeros(64)
                q[_INV_ZIGZAG] = zz
                quant[tq] = q.reshape(8, 8).astype(np.float64)
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                if j + 17 > len(body):
                    raise ValueError("malformed JPEG: truncated DHT")
                bits = list(body[j + 1 : j + 17])
                cnt = sum(bits)
                if j + 17 + cnt > len(body):
                    raise ValueError("malformed JPEG: truncated DHT values")
                vals = list(body[j + 17 : j + 17 + cnt])
                (huff_ac if tc else huff_dc)[th] = _decode_tables(bits, vals)
                j += 17 + cnt
        elif marker in (0xC0, 0xC2):
            progressive = marker == 0xC2
            if len(body) < 6:
                raise ValueError("malformed JPEG: truncated SOF segment")
            _prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG not supported")
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("malformed JPEG: truncated SOF components")
            comps = []
            for c in range(ncomp):
                cid, sampb, tq = body[6 + 3 * c : 9 + 3 * c]
                hi, vi = sampb >> 4, sampb & 0x0F
                if ncomp == 1:
                    hi = vi = 1  # single-component scans ignore sampling
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("malformed JPEG: bad sampling factor")
                comps.append((cid, hi, vi, tq))
            frame = (h, w, comps)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("malformed JPEG: SOS before SOF")
            if len(body) < 1:
                raise ValueError("malformed JPEG: empty SOS segment")
            ns = body[0]
            if ns < 1 or len(body) < 1 + 2 * ns:
                raise ValueError("malformed JPEG: truncated SOS components")
            frame_ids = {cid for cid, _hi, _vi, _tq in frame[2]}
            scan_comps = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                if cid not in frame_ids:
                    raise ValueError(
                        "malformed JPEG: scan component id not in frame"
                    )
                scan_comps.append((cid, tabs >> 4, tabs & 0x0F))
            if not progressive and len(scan_comps) == len(frame[2]):
                i = i + 2 + seg_len
                break  # single interleaved scan — the classic fast path
            # multi-scan file: progressive, OR a baseline frame whose
            # components split across full-band scans (r9) — collect
            # every scan, then dispatch below
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("malformed JPEG: truncated SOS params")
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            data_start = i + 2 + seg_len
            scans.append((
                scan_comps, ss, se, ahal >> 4, ahal & 0x0F, data_start,
                dict(huff_dc), dict(huff_ac), restart_interval,
            ))
            scan_comps = None
            i = _skip_entropy(payload, data_start)
            continue
        i += 2 + seg_len
    if progressive:
        if not scans:
            raise NoScanData("JPEG has headers but no scan data")
        return _apply_orientation(
            _decode_progressive(payload, frame, quant, scans), orientation
        )
    if scans:  # baseline split across full-band scans (r9)
        return _apply_orientation(
            _decode_baseline_scans(payload, frame, quant, scans), orientation
        )
    if scan_comps is None:
        if frame is not None:
            raise NoScanData("JPEG has headers but no scan data")
        raise ValueError("malformed JPEG: missing SOF/SOS (no scan data)")
    # r8 (VERDICT r7 #1): generic interleaved-MCU sequential decode —
    # 4:2:0 / 4:2:2 (the dominant web profiles) and 4:4:4 are the same
    # loop with per-component (h, v) block counts per MCU. Coefficients
    # land in per-component stores; dequant+IDCT is one batched einsum
    # per component; subsampled chroma planes are bilinearly upsampled
    # to frame size before the color transform.
    h, w, comps = frame
    hmax = max(hi for _cid, hi, _vi, _tq in comps)
    vmax = max(vi for _cid, _hi, vi, _tq in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    nch = len(comps)
    samp_of = {cid: (hi, vi) for cid, hi, vi, _tq in comps}
    tq_of = {cid: tq for cid, _hi, _vi, tq in comps}
    comp_pos = {cid: k for k, (cid, _hi, _vi, _tq) in enumerate(comps)}
    coef = [
        np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.float64)
        for _cid, hi, vi, _tq in comps
    ]
    reader = _BitReader(payload, i)
    prev_dc = [0] * nch
    done, rst = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and done and done % restart_interval == 0:
                reader.restart_align(rst)
                rst = (rst + 1) & 7
                prev_dc = [0] * nch
            done += 1
            for cid, td, ta in scan_comps:
                ci = comp_pos[cid]
                hi, vi = samp_of[cid]
                if td not in huff_dc or ta not in huff_ac or tq_of[cid] not in quant:
                    raise ValueError("malformed JPEG: missing table for scan")
                for byy in range(vi):
                    for bxx in range(hi):
                        prev_dc[ci] = _decode_block_seq(
                            reader, huff_dc[td], huff_ac[ta],
                            coef[ci][my * vi + byy, mx * hi + bxx],
                            prev_dc[ci],
                        )
    return _apply_orientation(
        _idct_to_image(coef, comps, quant, h, w, hmax, vmax), orientation
    )
