"""operators/jpeg.py vs an INDEPENDENT test-side baseline JPEG encoder.

The encoder here shares no code with the decoder: its own per-spec
forward DCT (the direct T.81 A.3.3 cosine sum, not a matrix product),
its own canonical Huffman tables (generated programmatically — DC
categories at 4 bits, the full 162-symbol AC alphabet at 8 bits — so
the decoder's generic DHT parser is exercised, not a hardcoded table),
its own zigzag, stuffing, and restart-marker writer. Round-trips check:

- near-lossless quant=1 tables: reconstruction within the DCT
  coefficient rounding bound (|err| <= 4 gray levels),
- Annex K luminance/chrominance tables on a smooth gradient: small
  mean error (the lossy-path sanity),
- grayscale 1-channel contract, 4:2:0 subsampling, non-multiple-of-8
  sizes (edge padding + crop), and DRI restart intervals with DC
  predictor reset,
- the documented raise on progressive (SOF2) streams,
- integration through multimodal._parse_image's magic dispatch.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kafka_etl_consumer_spark.operators.jpeg import parse_jpeg
from kafka_etl_consumer_spark.operators.multimodal import _parse_image

# --- independent encoder ----------------------------------------------------

ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K (T.81 Table K.1/K.2) quantization tables, row-major
K1_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
K2_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# canonical tables: DC categories 0..11 all at 4 bits; AC alphabet
# (EOB, ZRL, run 0-15 x size 1-10) all at 8 bits
DC_SYMS = list(range(12))
AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _canon(lengths_symbols):
    code, out = 0, {}
    for length, syms in lengths_symbols:
        for s in syms:
            out[s] = (length, code)
            code += 1
    return out


DC_CODES = _canon([(4, DC_SYMS)])
AC_CODES = _canon([(8, AC_SYMS)])


def _dht(tc, th, length, syms):
    bits = [0] * 16
    bits[length - 1] = len(syms)
    payload = bytes([tc << 4 | th]) + bytes(bits) + bytes(syms)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.acc, self.n = 0, 0

    def align(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-fill


def _fdct(block):
    """Direct T.81 A.3.3 forward DCT (independent of the decoder's
    matrix formulation)."""
    out = np.zeros((8, 8))
    for k in range(8):
        for l in range(8):  # noqa: E741
            ck = 1 / np.sqrt(2) if k == 0 else 1.0
            cl = 1 / np.sqrt(2) if l == 0 else 1.0
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (
                        block[y, x]
                        * np.cos((2 * x + 1) * l * np.pi / 16)
                        * np.cos((2 * y + 1) * k * np.pi / 16)
                    )
            out[k, l] = 0.25 * ck * cl * s
    return out


def _category(v):
    return 0 if v == 0 else int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v, t):
    return v if v >= 0 else v + (1 << t) - 1


def _encode_block(wr, block, q, pred):
    coef = np.round(_fdct(block.astype(np.float64) - 128.0) / q.reshape(8, 8))
    zz = coef.reshape(-1)[ZZ].astype(int)
    diff = int(zz[0]) - pred
    t = _category(diff)
    ln, code = DC_CODES[t]
    wr.put(code, ln)
    if t:
        wr.put(_amplitude(diff, t), t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = AC_CODES[0xF0]
            wr.put(code, ln)
            run -= 16
        s = _category(v)
        ln, code = AC_CODES[(run << 4) | s]
        wr.put(code, ln)
        wr.put(_amplitude(v, s), s)
        run = 0
    if run:
        ln, code = AC_CODES[0x00]
        wr.put(code, ln)
    return int(zz[0])


def _pad_to(img, mh, mw):
    h, w = img.shape
    return np.pad(img, ((0, mh - h), (0, mw - w)), mode="edge")


def _blocks(plane):
    h, w = plane.shape
    for by in range(h // 8):
        for bx in range(w // 8):
            yield plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]


def encode_jpeg(img, quant=(K1_LUM, K2_CHR), subsampling="444",
                restart_interval=0):
    """Baseline JFIF encoder: img is (h, w) gray or (h, w, 3) RGB."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    out = bytearray(b"\xff\xd8")
    qy = np.clip(np.round(quant[0]), 1, 255)
    qc = np.clip(np.round(quant[1]), 1, 255)
    for tq, q in ((0, qy),) if gray else ((0, qy), (1, qc)):
        payload = bytes([tq]) + bytes(int(q[z]) for z in ZZ)
        out += b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    if gray:
        comps = [(1, 1, 1, 0)]
    elif subsampling == "444":
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:  # 420
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch_, cv, tq in comps:
        sof += bytes([cid, ch_ << 4 | cv, tq])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht(0, 0, 4, DC_SYMS) + _dht(1, 0, 8, AC_SYMS)
    if not gray:
        out += _dht(0, 1, 4, DC_SYMS) + _dht(1, 1, 8, AC_SYMS)
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00 if gray or cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    if gray:
        planes = {1: img.astype(np.float64)}
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        planes = {1: y, 2: cb, 3: cr}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = {}
    for cid, ch_, cv, _tq in comps:
        p = planes[cid]
        if ch_ != hmax or cv != vmax:  # box-average downsample
            fh, fv = hmax // ch_, vmax // cv
            ph = _pad_to(p, -(-p.shape[0] // fv) * fv, -(-p.shape[1] // fh) * fh)
            p = ph.reshape(ph.shape[0] // fv, fv, ph.shape[1] // fh, fh).mean(
                axis=(1, 3)
            )
        padded[cid] = _pad_to(p, mcuy * cv * 8, mcux * ch_ * 8)

    wr = _BitWriter()
    pred = {c[0]: 0 for c in comps}
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wr.align()
                wr.out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                pred = {c[0]: 0 for c in comps}
            for cid, ch_, cv, tq in comps:
                qrow = qy if tq == 0 else qc
                for by in range(cv):
                    for bx in range(ch_):
                        blk = padded[cid][
                            (my * cv + by) * 8 : (my * cv + by) * 8 + 8,
                            (mx * ch_ + bx) * 8 : (mx * ch_ + bx) * 8 + 8,
                        ]
                        pred[cid] = _encode_block(wr, blk, qrow, pred[cid])
            mcu_count += 1
    wr.align()
    out += wr.out + b"\xff\xd9"
    return bytes(out)


# --- tests ------------------------------------------------------------------

ONES = (np.ones(64), np.ones(64))


def _gradient(h, w, color=True):
    yy, xx = np.mgrid[0:h, 0:w]
    g = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    if not color:
        return g
    return np.stack([g, ((xx * 5) % 256).astype(np.uint8),
                     ((yy * 7) % 256).astype(np.uint8)], axis=-1)


def _smooth(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (128 + 60 * np.sin(xx / 9.0)).astype(np.uint8)
    g = (128 + 60 * np.cos(yy / 11.0)).astype(np.uint8)
    b = (128 + 40 * np.sin((xx + yy) / 13.0)).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def test_gray_near_lossless_roundtrip():
    img = _gradient(24, 16, color=False)
    w, h, ch, flat = parse_jpeg(encode_jpeg(img, quant=ONES))
    assert (w, h, ch) == (16, 24, 1)
    err = np.abs(flat.reshape(24, 16).astype(int) - img.astype(int))
    assert err.max() <= 4, err.max()


def test_color_444_near_lossless_roundtrip():
    img = _smooth(16, 24)
    w, h, ch, flat = parse_jpeg(encode_jpeg(img, quant=ONES))
    assert (w, h, ch) == (24, 16, 3)
    err = np.abs(flat.reshape(16, 24, 3).astype(int) - img.astype(int))
    # color round-trips add the RGB<->YCbCr conversions on both sides
    assert err.max() <= 6, err.max()


def test_color_annexk_smooth():
    img = _smooth(32, 32)
    w, h, ch, flat = parse_jpeg(encode_jpeg(img))
    got = flat.reshape(32, 32, 3).astype(int)
    err = np.abs(got - img.astype(int))
    assert err.mean() < 6, err.mean()
    assert err.max() < 40, err.max()


def test_color_420_subsampling():
    img = _smooth(24, 40)
    w, h, ch, flat = parse_jpeg(encode_jpeg(img, quant=ONES, subsampling="420"))
    assert (w, h, ch) == (40, 24, 3)
    err = np.abs(flat.reshape(24, 40, 3).astype(int) - img.astype(int))
    # chroma is box-averaged 2x2 then replicated: smooth chroma keeps
    # the error small; luma stays near-lossless
    assert err.mean() < 4, err.mean()


def test_odd_dimensions_cropped():
    img = _gradient(13, 11, color=False)
    w, h, ch, flat = parse_jpeg(encode_jpeg(img, quant=ONES))
    assert (w, h, ch) == (11, 13, 1)
    err = np.abs(flat.reshape(13, 11).astype(int) - img.astype(int))
    assert err.max() <= 4


def test_restart_intervals_reset_predictors():
    img = _gradient(32, 32, color=False)
    by = encode_jpeg(img, quant=ONES, restart_interval=3)
    assert b"\xff\xdd" in by and by.count(b"\xff\xd0") >= 1
    w, h, ch, flat = parse_jpeg(by)
    err = np.abs(flat.reshape(32, 32).astype(int) - img.astype(int))
    assert err.max() <= 4, err.max()


def test_progressive_raises():
    by = bytearray(encode_jpeg(_gradient(8, 8, color=False), quant=ONES))
    i = by.index(b"\xff\xc0")
    by[i + 1] = 0xC2  # rewrite SOF0 -> SOF2
    with pytest.raises(ValueError, match="baseline"):
        parse_jpeg(bytes(by))


def test_parse_image_dispatch():
    img = _gradient(16, 16, color=False)
    w, h, ch, flat = _parse_image(encode_jpeg(img, quant=ONES))
    assert (w, h, ch) == (16, 16, 1)
    assert flat.dtype == np.uint8
