"""Pure-stdlib media codecs — the REAL decode path for the multimodal
stages on formats the standard library can handle.

This container ships no PIL/ffmpeg, but that does not make every decode
fake: PNG is zlib + per-scanline filters (both stdlib), WAV is the
``wave`` module, and JPEG is the from-scratch ITU T.81 decoder in
``jpegcodec.py`` (baseline AND progressive). These give
``image_feature_stage``/``audio_feature_stage`` genuine codecs for the
dominant web formats; video (and arithmetic-coded JPEG) still
NULL-fallback at the clearly-marked plug-in point.

Everything here is per-row pure Python BY DESIGN: it runs inside the
Arrow-batched ``mapInPandas`` stages, which is exactly where per-payload
imperative work belongs (no built-in Spark expression decodes a PNG).

The PNG subset: bit depth 8, color types 0 (gray), 2 (RGB), 6 (RGBA),
no interlace — the common web-asset shapes. All five scanline filters
(None/Sub/Up/Average/Paeth) are implemented; the encoder can emit any of
them, which is how the tests pin the decoder's filter arithmetic without
an external reference codec.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}


class UnsupportedMediaError(ValueError):
    """Payload is not in the stdlib-decodable subset."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


MAX_PIXELS = 4_000_000          # decode bound: one payload must never
#                                 OOM a worker (PNG bombs, poster-size
#                                 images) — featurize thumbnails, route
#                                 oversized media to a dedicated path


def decode_png(payload: bytes, max_pixels: int = MAX_PIXELS) -> dict:
    """PNG → {width, height, channels, pixels} (pixels = row-major list
    of per-pixel tuples of 0-255 ints). Any malformed input — truncated
    chunks, corrupt zlib streams, lying headers — raises
    ``UnsupportedMediaError``, never an internal codec exception: the
    mapInPandas callers NULL-fallback on that one type, and a 100-TB
    crawl always contains broken files."""
    if payload[:8] != _PNG_SIG:
        raise UnsupportedMediaError("not a PNG signature")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    idat = b""
    try:
        while pos + 8 <= len(payload):
            (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
                payload[pos + 4:pos + 8]
            data = payload[pos + 8:pos + 8 + length]
            pos += 12 + length                   # skip CRC
            if ctype == b"IHDR":
                width, height, bit_depth, color_type, _comp, _filt, \
                    interlace = struct.unpack(">IIBBBBB", data)
                if bit_depth != 8 or color_type not in _CHANNELS \
                        or interlace:
                    raise UnsupportedMediaError(
                        f"PNG subset: depth8 gray/RGB/RGBA non-interlaced "
                        f"(got depth={bit_depth} color={color_type})")
                if width * height > max_pixels:
                    raise UnsupportedMediaError(
                        f"PNG {width}x{height} exceeds the "
                        f"{max_pixels}-pixel decode bound")
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
        if width is None or not idat:
            raise UnsupportedMediaError("missing IHDR/IDAT")
        ch = _CHANNELS[color_type]
        stride = width * ch
        need = height * (stride + 1)
        # bounded inflate: a high-ratio zlib bomb must not expand past
        # the size the (already-bounded) header promises
        raw = zlib.decompressobj().decompress(idat, need)
    except UnsupportedMediaError:
        raise
    except (struct.error, zlib.error, IndexError, OverflowError,
            MemoryError) as e:
        raise UnsupportedMediaError(f"malformed PNG: {e}") from e
    if len(raw) < need:
        raise UnsupportedMediaError("truncated PNG pixel data")
    pixels: list = []
    prev = bytearray(stride)
    off = 0
    for _y in range(height):
        ftype = raw[off]
        line = bytearray(raw[off + 1:off + 1 + stride])
        off += 1 + stride
        if ftype == 1:                           # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:                         # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:                         # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:                         # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise UnsupportedMediaError(f"unknown PNG filter {ftype}")
        pixels.extend(tuple(line[x * ch:(x + 1) * ch])
                      for x in range(width))
        prev = line
    return {"width": width, "height": height, "channels": ch,
            "pixels": pixels}


def _filter_line(line: bytes, prev: bytes, ftype: int, ch: int) -> bytes:
    out = bytearray(len(line))
    for i in range(len(line)):
        left = line[i - ch] if i >= ch else 0
        up = prev[i]
        ul = prev[i - ch] if i >= ch else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        else:
            pred = _paeth(left, up, ul)
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def encode_png(pixels: list, width: int, height: int,
               channels: int = 1, filter_type: int = 0) -> bytes:
    """Minimal PNG writer (tests + corpus tooling): ``pixels`` as in
    ``decode_png``. ``filter_type`` selects the scanline filter for every
    row — the tests roundtrip all five to pin the decoder arithmetic."""
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels
    flat = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = bytes(v for px in pixels[y * width:(y + 1) * width]
                     for v in px)
        flat.append(filter_type)
        flat += _filter_line(line, prev, filter_type, channels)
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(flat)))
            + chunk(b"IEND", b""))


def _gray(px: tuple) -> int:
    if len(px) == 1:
        return px[0]
    r, g, b = px[0], px[1], px[2]                # alpha ignored
    return (299 * r + 587 * g + 114 * b) // 1000


def image_features(payload: bytes, n_features: int = 16) -> dict:
    """Real decode → featurize for PNG and baseline-JPEG payloads
    (signature dispatch): true dimensions, an 8×8 average-hash (the
    standard aHash construction: block-mean downsample, bit =
    mean-of-block > global mean), and an ``n_features``-bin normalized
    grayscale histogram. Raises ``UnsupportedMediaError`` for other
    formats (arithmetic-coded JPEG, video containers, …)."""
    if payload[:2] == b"\xFF\xD8":
        from .jpegcodec import decode_jpeg
        img = decode_jpeg(payload)
    else:
        img = decode_png(payload)
    w, h = img["width"], img["height"]
    gray = [_gray(px) for px in img["pixels"]]
    # 8×8 block means (aHash downsample; blocks cover the image exactly
    # via integer bucketing so any w,h ≥ 1 works)
    sums = [[0, 0] for _ in range(64)]
    for y in range(h):
        by = min(y * 8 // h, 7)
        row = y * w
        for x in range(w):
            cell = sums[by * 8 + min(x * 8 // w, 7)]
            cell[0] += gray[row + x]
            cell[1] += 1
    means = [s / c if c else 0.0 for s, c in sums]
    overall = sum(means) / 64.0
    bits = 0
    for i, m in enumerate(means):
        if m > overall:
            bits |= 1 << i
    if bits >= 1 << 63:
        bits -= 1 << 64                          # signed 64-bit slot
    hist = [0] * n_features
    for v in gray:
        hist[min(v * n_features // 256, n_features - 1)] += 1
    n = max(len(gray), 1)
    return {"width": w, "height": h, "phash": bits,
            "features": [round(c / n, 6) for c in hist]}


# ---------------------------------------------------------------------------
# WAV (stdlib ``wave``)
# ---------------------------------------------------------------------------

def decode_wav(payload: bytes) -> dict:
    """WAV → {n_channels, sample_rate, n_frames, samples} (16-bit PCM;
    samples = first channel, signed ints)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as w:
            ch, sw, rate, nf = (w.getnchannels(), w.getsampwidth(),
                                w.getframerate(), w.getnframes())
            frames = w.readframes(nf)
    except (wave.Error, EOFError) as e:
        raise UnsupportedMediaError(f"not a decodable WAV: {e}") from e
    if sw != 2:
        raise UnsupportedMediaError("WAV subset: 16-bit PCM")
    import array
    a = array.array("h")
    a.frombytes(frames[: (len(frames) // (2 * ch)) * 2 * ch])
    return {"n_channels": ch, "sample_rate": rate, "n_frames": nf,
            "samples": a[::ch]}


def audio_features(payload: bytes, n_segments: int = 16) -> dict:
    """Real WAV featurize: duration + per-segment RMS energy profile
    (the audio analog of the histogram features)."""
    import math

    wav = decode_wav(payload)
    s = wav["samples"]
    n = len(s)
    dur_ms = int(n * 1000 / wav["sample_rate"]) if wav["sample_rate"] else 0
    feats = []
    for i in range(n_segments):
        seg = s[i * n // n_segments:(i + 1) * n // n_segments]
        if len(seg):
            rms = math.sqrt(sum(v * v for v in seg) / len(seg)) / 32768.0
        else:
            rms = 0.0
        feats.append(round(rms, 6))
    return {"n_channels": wav["n_channels"],
            "sample_rate": wav["sample_rate"],
            "duration_ms": dur_ms, "features": feats}
