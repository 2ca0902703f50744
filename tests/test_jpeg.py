"""Baseline JPEG codec: roundtrip pins (flat quant=1 → ±1), an
encoder-INDEPENDENT hand-assembled bitstream fixture, subsampled and
restart-interval streams, and the NULL-fallback contract for
out-of-subset payloads."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ocr_devnagari_spark.codecs import UnsupportedMediaError, image_features
from ocr_devnagari_spark.jpegcodec import decode_jpeg, encode_jpeg


def _gradient_gray(w, h):
    return [((x * 16 + y * 3) % 256,) for y in range(h) for x in range(w)]


def test_roundtrip_gray_q1_within_1():
    w, h = 16, 12
    px = _gradient_gray(w, h)
    dec = decode_jpeg(encode_jpeg(px, w, h, channels=1, quant=1))
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, 1)
    assert max(abs(a[0] - b[0])
               for a, b in zip(px, dec["pixels"])) <= 1


def test_roundtrip_rgb_q1_within_1():
    w, h = 16, 12
    px = [((x * 13) % 256, (y * 17) % 256, ((x + y) * 7) % 256)
          for y in range(h) for x in range(w)]
    dec = decode_jpeg(encode_jpeg(px, w, h, channels=3, quant=1))
    assert dec["channels"] == 3
    assert max(abs(a[i] - b[i]) for a, b in zip(px, dec["pixels"])
               for i in range(3)) <= 1


def test_solid_color_exact_and_non_multiple_of_8():
    # 10x6 forces edge padding in the encoder and cropping in the decoder
    px = [(200,)] * 60
    dec = decode_jpeg(encode_jpeg(px, 10, 6, 1, quant=1))
    assert (dec["width"], dec["height"]) == (10, 6)
    assert all(p == (200,) for p in dec["pixels"])


def test_lossy_quant_still_close():
    w, h = 16, 16
    px = _gradient_gray(w, h)
    dec = decode_jpeg(encode_jpeg(px, w, h, 1, quant=8))
    err = np.mean([abs(a[0] - b[0]) for a, b in zip(px, dec["pixels"])])
    assert err < 8          # lossy but sane


def test_hand_assembled_bitstream_fixture():
    """A byte-literal 8×8 solid-gray baseline JPEG assembled from the
    spec BY HAND (std Annex-K tables, flat quant 1): DC coeff 576 =
    category 10 → huffman 11111110 + magnitude 1001000000, then EOB
    1010, padded with 1s. Decoding it pins the marker parser, table
    builder, bit reader and IDCT against the public spec with NO shared
    code path with the encoder."""
    qzz = bytes([1] * 64)
    dqt = b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" + qzz
    sof = (b"\xFF\xC0" + struct.pack(">H", 11)
           + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    from ocr_devnagari_spark.jpegcodec import _STD_AC_LUMA, _STD_DC_LUMA
    dht_dc = (b"\xFF\xC4"
              + struct.pack(">H", 2 + 1 + 16 + len(_STD_DC_LUMA[1]))
              + b"\x00" + bytes(_STD_DC_LUMA[0]) + bytes(_STD_DC_LUMA[1]))
    dht_ac = (b"\xFF\xC4"
              + struct.pack(">H", 2 + 1 + 16 + len(_STD_AC_LUMA[1]))
              + b"\x10" + bytes(_STD_AC_LUMA[0]) + bytes(_STD_AC_LUMA[1]))
    sos = (b"\xFF\xDA" + struct.pack(">H", 8) + b"\x01"
           + bytes([1, 0x00]) + b"\x00\x3F\x00")
    # 11111110 1001000000 1010 + 11 pad = FE 90 2B FF(stuffed 00)... :
    # 22 data bits + 2 pad-1 bits = 3 bytes: 11111110 10010000 001010 11
    entropy = bytes([0b11111110, 0b10010000, 0b00101011])
    jpg = (b"\xFF\xD8" + dqt + sof + dht_dc + dht_ac + sos + entropy
           + b"\xFF\xD9")
    dec = decode_jpeg(jpg)
    assert (dec["width"], dec["height"], dec["channels"]) == (8, 8, 1)
    assert all(p == (200,) for p in dec["pixels"])


def test_subsampled_420_stream():
    """4:2:0 decode: Y at 2×2 sampling, chroma at 1×1 — built from the
    encoder's block primitives (one 16×16 MCU: 4 Y blocks in raster
    order, then Cb, Cr), pinning the MCU interleave + upsample path the
    4:4:4 encoder never exercises."""
    from ocr_devnagari_spark.jpegcodec import (
        _STD_AC_CHROMA,
        _STD_AC_LUMA,
        _STD_DC_CHROMA,
        _STD_DC_LUMA,
        ZIGZAG,
        _BitWriter,
        _build_encode_table,
        _encode_block,
        _fdct2,
    )

    w = h = 16
    # luma gradient, flat chroma (max upsample error = rounding only)
    r = np.zeros((h, w))
    for y in range(h):
        for x in range(w):
            r[y, x] = (x * 8 + y * 4) % 256
    ycc = np.stack([r, np.full((h, w), 140.0),
                    np.full((h, w), 90.0)], axis=-1)

    def blocks_of(plane):
        out = []
        for by in range(plane.shape[0] // 8):
            for bx in range(plane.shape[1] // 8):
                out.append(plane[by * 8:(by + 1) * 8,
                                 bx * 8:(bx + 1) * 8])
        return out

    yb = blocks_of(ycc[..., 0])
    cb = ycc[::2, ::2, 1]                      # box-downsampled chroma
    cr = ycc[::2, ::2, 2]
    wr = _BitWriter()
    dc_l = _build_encode_table(*_STD_DC_LUMA)
    ac_l = _build_encode_table(*_STD_AC_LUMA)
    dc_c = _build_encode_table(*_STD_DC_CHROMA)
    ac_c = _build_encode_table(*_STD_AC_CHROMA)

    def emit(block, pred, dct, act):
        coefs = np.rint(_fdct2(block - 128.0))
        zz = np.array([coefs.reshape(-1)[ZIGZAG[z]] for z in range(64)])
        return _encode_block(wr, zz, pred, dct, act)

    pred_y = 0
    for b in yb:                               # raster = MCU order at 2x2
        pred_y = emit(b, pred_y, dc_l, ac_l)
    emit(cb, 0, dc_c, ac_c)
    emit(cr, 0, dc_c, ac_c)
    body = wr.flush()

    qzz = bytes([1] * 64)
    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" + qzz
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x01" + qzz
    sof = struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += b"\xFF\xC0" + struct.pack(">H", len(sof) + 2) + sof
    for cls, tid, (bits, vals) in ((0, 0, _STD_DC_LUMA),
                                   (1, 0, _STD_AC_LUMA),
                                   (0, 1, _STD_DC_CHROMA),
                                   (1, 1, _STD_AC_CHROMA)):
        seg = bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", len(seg) + 2) + seg
    sos = b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos
    out += body + b"\xFF\xD9"

    dec = decode_jpeg(bytes(out))
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, 3)
    # reconstruct expected RGB from the flat-chroma YCbCr
    got = np.array(dec["pixels"], dtype=np.float64).reshape(h, w, 3)
    want_r = r + 1.402 * (90.0 - 128.0)
    want_g = r - 0.344136 * (140.0 - 128.0) - 0.714136 * (90.0 - 128.0)
    want_b = r + 1.772 * (140.0 - 128.0)
    want = np.clip(np.rint(np.stack([want_r, want_g, want_b], axis=-1)),
                   0, 255)
    assert np.abs(got - want).max() <= 2


def test_restart_interval_stream():
    """DRI/RSTn: three MCUs, restart every one — DC predictors reset at
    each marker, so a decoder that ignores either produces garbage."""
    from ocr_devnagari_spark.jpegcodec import (
        _STD_AC_LUMA,
        _STD_DC_LUMA,
        ZIGZAG,
        _BitWriter,
        _build_encode_table,
        _encode_block,
        _fdct2,
    )

    vals = [64, 128, 192]
    dc_l = _build_encode_table(*_STD_DC_LUMA)
    ac_l = _build_encode_table(*_STD_AC_LUMA)
    body = bytearray()
    for i, v in enumerate(vals):
        wr = _BitWriter()
        coefs = np.rint(_fdct2(np.full((8, 8), float(v)) - 128.0))
        zz = np.array([coefs.reshape(-1)[ZIGZAG[z]] for z in range(64)])
        _encode_block(wr, zz, 0, dc_l, ac_l)       # pred RESET per MCU
        body += wr.flush()
        if i < len(vals) - 1:
            body += bytes([0xFF, 0xD0 + i])
    qzz = bytes([1] * 64)
    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" + qzz
    out += b"\xFF\xDD" + struct.pack(">HH", 4, 1)  # DRI: interval 1
    sof = struct.pack(">BHHB", 8, 8, 24, 1) + bytes([1, 0x11, 0])
    out += b"\xFF\xC0" + struct.pack(">H", len(sof) + 2) + sof
    for cls, (bits, vs) in ((0, _STD_DC_LUMA), (1, _STD_AC_LUMA)):
        seg = bytes([cls << 4]) + bytes(bits) + bytes(vs)
        out += b"\xFF\xC4" + struct.pack(">H", len(seg) + 2) + seg
    sos = b"\x01" + bytes([1, 0x00]) + b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos
    out += body + b"\xFF\xD9"

    dec = decode_jpeg(bytes(out))
    assert (dec["width"], dec["height"]) == (24, 8)
    px = np.array([p[0] for p in dec["pixels"]]).reshape(8, 24)
    for i, v in enumerate(vals):
        assert np.abs(px[:, i * 8:(i + 1) * 8] - v).max() <= 1


def test_out_of_subset_raises():
    px = _gradient_gray(8, 8)
    good = encode_jpeg(px, 8, 8, 1, quant=1)
    # arithmetic-coded sequential: SOF0 -> SOF9
    arith = good.replace(b"\xFF\xC0", b"\xFF\xC9", 1)
    with pytest.raises(UnsupportedMediaError, match="SOF9"):
        decode_jpeg(arith)
    # a SOF2 flip alone leaves a BASELINE scan header (Se=63 with Ss=0),
    # which is not a legal progressive scan — malformed, not misdecoded
    prog = good.replace(b"\xFF\xC0", b"\xFF\xC2", 1)
    with pytest.raises(UnsupportedMediaError):
        decode_jpeg(prog)
    # truncated entropy data
    with pytest.raises(UnsupportedMediaError):
        decode_jpeg(good[:len(good) - 12])
    with pytest.raises(UnsupportedMediaError, match="SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")


# ---------------------------------------------------------------------------
# Progressive (SOF2)
# ---------------------------------------------------------------------------

def test_progressive_roundtrip_gray_and_rgb_q1():
    from ocr_devnagari_spark.jpegcodec import encode_jpeg_progressive
    w, h = 21, 13
    gray = _gradient_gray(w, h)
    dec = decode_jpeg(encode_jpeg_progressive(gray, w, h, channels=1,
                                              quant=1))
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, 1)
    assert max(abs(a[0] - b[0])
               for a, b in zip(gray, dec["pixels"])) <= 1
    rgb = [((x * 13) % 256, (y * 17) % 256, ((x + y) * 7) % 256)
           for y in range(h) for x in range(w)]
    dec3 = decode_jpeg(encode_jpeg_progressive(rgb, w, h, channels=3,
                                               quant=1))
    base3 = decode_jpeg(encode_jpeg(rgb, w, h, channels=3, quant=1))
    # progressive decode ≡ the baseline re-encode of the same pixels
    assert max(abs(a[i] - b[i])
               for a, b in zip(base3["pixels"], dec3["pixels"])
               for i in range(3)) <= 1


def test_progressive_lossy_quant_close():
    from ocr_devnagari_spark.jpegcodec import encode_jpeg_progressive
    w, h = 16, 16
    px = _gradient_gray(w, h)
    dec = decode_jpeg(encode_jpeg_progressive(px, w, h, channels=1,
                                              quant=8))
    base = decode_jpeg(encode_jpeg(px, w, h, channels=1, quant=8))
    # same quantized coefficients through either scan script
    assert dec["pixels"] == base["pixels"]


def test_hand_assembled_progressive_bitstream():
    """Encoder-INDEPENDENT progressive fixture assembled bit-by-bit from
    T.81 Annex G: 16×8 grayscale, flat quant 1, custom AC table carrying
    the EOBn symbols the Annex-K tables lack. Exercises what the
    encoder's per-block-EOB scan script never emits: a cross-block EOB
    RUN in an AC-first scan, and a refinement EOB run whose covered
    block still consumes correction bits for its nonzero history.

    Scan script over blocks A,B:
      1. DC  (Ss=0,Ah=0,Al=0):  A: diff 8 → cat4 '101'+'1000'; B: '00'.
      2. AC first (1-63, Al=1): A: (0,2)'00'+3'11', EOB0 '10';
         B: (1,1)'1110'+sign'1' → k2 = 1<<1, EOB0 '10'.
      3. AC refine (1-63, Ah=1,Al=0): A: 0x11 '1110'+sign'1', walk
         corrects k1 (bit '1': 6→7), inserts +1 at k3; EOB1 '01'+'0' →
         run of 2 covers A's tail AND block B, whose nonzero k2 must
         STILL read its correction bit ('1': 2→3).
    """
    import numpy as np

    from ocr_devnagari_spark.jpegcodec import (
        ZIGZAG,
        _idct2,
        _STD_DC_LUMA,
    )

    qzz = bytes([1] * 64)
    dqt = b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" + qzz
    sof = (b"\xFF\xC2" + struct.pack(">H", 11)
           + struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    dht_dc = (b"\xFF\xC4"
              + struct.pack(">H", 2 + 1 + 16 + len(_STD_DC_LUMA[1]))
              + b"\x00" + bytes(_STD_DC_LUMA[0]) + bytes(_STD_DC_LUMA[1]))
    # custom AC table: len2: 00→0x02, 01→0x10(EOB1), 10→0x00(EOB0);
    # len3: 110→0x01; len4: 1110→0x11; len5: 11110→0xF0
    ac_bits = [0, 3, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    ac_vals = [0x02, 0x10, 0x00, 0x01, 0x11, 0xF0]
    dht_ac = (b"\xFF\xC4"
              + struct.pack(">H", 2 + 1 + 16 + len(ac_vals))
              + b"\x10" + bytes(ac_bits) + bytes(ac_vals))

    def sos(ss, se, ah, al, entropy):
        return (b"\xFF\xDA" + struct.pack(">H", 8) + b"\x01"
                + bytes([1, 0x00]) + bytes([ss, se, (ah << 4) | al])
                + entropy)

    # 101 1000 00 + pad(7×1)                  = 10110000 01111111
    scan1 = sos(0, 0, 0, 0, bytes([0b10110000, 0b01111111]))
    # 00 11 10 1110 1 10 + pad(3×1)           = 00111011 10110111
    scan2 = sos(1, 63, 0, 1, bytes([0b00111011, 0b10110111]))
    # 1110 1 1 01 0 1 + pad(6×1)              = 11101101 01111111
    scan3 = sos(1, 63, 1, 0, bytes([0b11101101, 0b01111111]))
    jpg = (b"\xFF\xD8" + dqt + sof + dht_dc + dht_ac
           + scan1 + scan2 + scan3 + b"\xFF\xD9")
    dec = decode_jpeg(jpg)
    assert (dec["width"], dec["height"], dec["channels"]) == (16, 8, 1)

    coef_a = np.zeros(64)
    coef_a[0], coef_a[ZIGZAG[1]], coef_a[ZIGZAG[3]] = 8, 7, 1
    coef_b = np.zeros(64)
    coef_b[0], coef_b[ZIGZAG[2]] = 8, 3
    want = np.zeros((8, 16))
    want[:, :8] = _idct2(coef_a.reshape(8, 8)) + 128.0
    want[:, 8:] = _idct2(coef_b.reshape(8, 8)) + 128.0
    want = np.clip(np.rint(want), 0, 255).astype(int)
    got = np.array([p[0] for p in dec["pixels"]]).reshape(8, 16)
    assert (got == want).all()


def test_progressive_subsampled_420_stream():
    """Progressive 4:2:0: interleaved DC-first over the MCU grid (4 Y
    blocks then Cb, Cr — the padded-grid path the 4:4:4 progressive
    encoder never takes), DC refinement, then per-component AC scans
    over each component's OWN block grid. Assembled from the encoder
    primitives; expected pixels = the flat-chroma analytic image."""
    from ocr_devnagari_spark.jpegcodec import (
        _STD_AC_CHROMA,
        _STD_AC_LUMA,
        _STD_DC_CHROMA,
        _STD_DC_LUMA,
        ZIGZAG,
        _BitWriter,
        _build_encode_table,
        _category,
        _enc_ac_first,
        _enc_ac_refine,
        _fdct2,
    )

    w = h = 16
    r = np.zeros((h, w))
    for y in range(h):
        for x in range(w):
            r[y, x] = (x * 8 + y * 4) % 256

    def coefblocks(plane):
        out = []
        for by in range(plane.shape[0] // 8):
            for bx in range(plane.shape[1] // 8):
                c = np.rint(_fdct2(
                    plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                    - 128.0))
                out.append(np.array(
                    [c.reshape(-1)[ZIGZAG[z]] for z in range(64)],
                    dtype=np.int64))
        return out

    yb = coefblocks(r)
    cbb = coefblocks(np.full((8, 8), 140.0))
    crb = coefblocks(np.full((8, 8), 90.0))
    dc_l = _build_encode_table(*_STD_DC_LUMA)
    ac_l = _build_encode_table(*_STD_AC_LUMA)
    dc_c = _build_encode_table(*_STD_DC_CHROMA)
    ac_c = _build_encode_table(*_STD_AC_CHROMA)

    def sos(cspec, ss, se, ah, al, body):
        p = bytes([len(cspec)])
        for cid, tt in cspec:
            p += bytes([cid, tt])
        p += bytes([ss, se, (ah << 4) | al])
        return b"\xFF\xDA" + struct.pack(">H", len(p) + 2) + p + body

    # DC first (Al=1), MCU-interleaved: Y(2x2 raster) then Cb, Cr
    wr = _BitWriter()
    preds = {0: 0, 1: 0, 2: 0}
    for blk, ci, tbl in [(yb[0], 0, dc_l), (yb[1], 0, dc_l),
                         (yb[2], 0, dc_l), (yb[3], 0, dc_l),
                         (cbb[0], 1, dc_c), (crb[0], 2, dc_c)]:
        dc = int(blk[0]) >> 1
        diff = dc - preds[ci]
        preds[ci] = dc
        t = _category(diff)
        wr.write(*tbl[t])
        if t:
            wr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    scans = [sos([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 0, 1,
                 wr.flush())]
    # DC refinement: same interleaved order, one bit per block
    wr = _BitWriter()
    for blk in (yb[0], yb[1], yb[2], yb[3], cbb[0], crb[0]):
        wr.write(int(blk[0]) & 1, 1)
    scans.append(sos([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 1, 0,
                     wr.flush()))
    # AC per component: first at Al=1 then refine to 0, full band
    for cid, blocks, act in ((1, yb, ac_l), (2, cbb, ac_c),
                             (3, crb, ac_c)):
        wr = _BitWriter()
        for blk in blocks:
            _enc_ac_first(wr, blk, act, 1, 63, 1)
        scans.append(sos([(cid, 0x00 if cid == 1 else 0x11)], 1, 63,
                         0, 1, wr.flush()))
    for cid, blocks, act in ((1, yb, ac_l), (2, cbb, ac_c),
                             (3, crb, ac_c)):
        wr = _BitWriter()
        for blk in blocks:
            _enc_ac_refine(wr, blk, act, 1, 63, 0)
        scans.append(sos([(cid, 0x00 if cid == 1 else 0x11)], 1, 63,
                         1, 0, wr.flush()))

    qzz = bytes([1] * 64)
    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" + qzz
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x01" + qzz
    sof = struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += b"\xFF\xC2" + struct.pack(">H", len(sof) + 2) + sof
    for cls, tid, (bits, vals) in ((0, 0, _STD_DC_LUMA),
                                   (1, 0, _STD_AC_LUMA),
                                   (0, 1, _STD_DC_CHROMA),
                                   (1, 1, _STD_AC_CHROMA)):
        seg = bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", len(seg) + 2) + seg
    for s in scans:
        out += s
    out += b"\xFF\xD9"

    dec = decode_jpeg(bytes(out))
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, 3)
    got = np.array(dec["pixels"], dtype=np.float64).reshape(h, w, 3)
    want_r = r + 1.402 * (90.0 - 128.0)
    want_g = r - 0.344136 * (140.0 - 128.0) - 0.714136 * (90.0 - 128.0)
    want_b = r + 1.772 * (140.0 - 128.0)
    want = np.clip(np.rint(np.stack([want_r, want_g, want_b], axis=-1)),
                   0, 255)
    assert np.abs(got - want).max() <= 2


def test_progressive_via_image_features():
    """The media stage dispatches progressive payloads like any JPEG
    (no NULL fallback any more)."""
    from ocr_devnagari_spark.jpegcodec import encode_jpeg_progressive
    px = _gradient_gray(16, 16)
    f = image_features(encode_jpeg_progressive(px, 16, 16, 1, quant=1))
    assert (f["width"], f["height"]) == (16, 16)
    assert isinstance(f["phash"], int)


def test_image_features_dispatches_jpeg():
    px = _gradient_gray(16, 16)
    f = image_features(encode_jpeg(px, 16, 16, 1, quant=1))
    assert (f["width"], f["height"]) == (16, 16)
    assert isinstance(f["phash"], int)
    assert abs(sum(f["features"]) - 1.0) < 1e-6


def test_grayscale_scan_is_noninterleaved_regardless_of_sampling():
    """T.81 A.2: an ns=1 scan is non-interleaved raster blocks even when
    SOF declares 2x2 sampling factors (grayscale conversions from color
    tools keep the luma factors). MCU tiling would scramble or reject
    these files."""
    w, h = 24, 8
    px = _gradient_gray(w, h)
    good = encode_jpeg(px, w, h, channels=1, quant=1)
    # patch the SOF sampling byte 0x11 -> 0x22 (entropy stream unchanged:
    # ns=1 scans are raster blocks either way per the spec)
    sof_at = good.index(b"\xFF\xC0")
    comp_samp = sof_at + 4 + 6 + 1          # marker+len+prec/h/w/nc + cid
    assert good[comp_samp] == 0x11
    patched = good[:comp_samp] + b"\x22" + good[comp_samp + 1:]
    dec = decode_jpeg(patched)
    assert (dec["width"], dec["height"]) == (w, h)
    assert max(abs(a[0] - b[0])
               for a, b in zip(px, dec["pixels"])) <= 1
