"""ISO BMFF (MP4) container parsing — from scratch off the public
ISO/IEC 14496-12 specification, stdlib only.

Scope: the CONTAINER level.  The parser walks the box tree and
reconstructs the full sample table of each track from the ``stbl``
boxes — per-sample byte offset, size, decode timestamp and sync
(keyframe) flag — which is everything frame SAMPLING needs: a 100-TB
media pipeline selects keyframe byte ranges here and hands the (small)
selected frame payloads to a pluggable pixel codec, instead of decoding
whole videos.  Codec pixel decode (H.264 etc.) genuinely needs external
libs and stays the documented plug-in (`operators/multimodal.py`).

Boxes understood: ftyp, moov, mvhd, trak, tkhd, mdia, mdhd, hdlr,
minf, stbl, stsd (first-entry fourcc), stts, stss, stsc, stsz, stco,
co64.  Version 0 and 1 full-box layouts are both handled where the
spec defines them (mvhd/tkhd/mdhd).  Unknown boxes are skipped by
size, never an error — crawl payloads are hostile.

``encode_mp4`` writes a minimal valid file (ftyp + mdat + moov, with
moov AFTER mdat so chunk offsets are known when the table is built) so
tests can roundtrip hand-chosen chunking/sync layouts byte-exactly.

No counterpart in the reference (an OCR orchestrator); part of the
engine's multimodal surface.
"""

from __future__ import annotations

import struct

from .codecs import UnsupportedMediaError

_U32 = struct.Struct(">I")
_U64 = struct.Struct(">Q")

# hard caps: hostile payloads must cost bounded work
MAX_BOXES = 10_000
MAX_SAMPLES = 1_000_000
MAX_TABLE_ENTRIES = 1_000_000


def _u32(b: bytes, o: int) -> int:
    return _U32.unpack_from(b, o)[0]


def _u64(b: bytes, o: int) -> int:
    return _U64.unpack_from(b, o)[0]


def iter_boxes(data: bytes, start: int, end: int):
    """Yield ``(fourcc, payload_start, payload_end)`` for the sibling
    boxes in ``data[start:end]``.  Malformed sizes terminate the walk
    (never loop or read out of bounds)."""
    off = start
    n = 0
    while off + 8 <= end and n < MAX_BOXES:
        size = _u32(data, off)
        typ = data[off + 4:off + 8]
        pay = off + 8
        if size == 1:
            if pay + 8 > end:
                return
            size = _u64(data, pay)
            pay += 8
            if size < 16:
                return
        elif size == 0:            # box extends to end of enclosing box
            size = end - off
        elif size < 8:
            return
        box_end = off + size
        if box_end > end or box_end <= off:
            return
        yield typ, pay, box_end
        off = box_end
        n += 1


def _find(data: bytes, start: int, end: int, fourcc: bytes):
    for typ, p, e in iter_boxes(data, start, end):
        if typ == fourcc:
            return p, e
    return None


def _full_box(data: bytes, p: int) -> tuple[int, int]:
    """(version, payload offset past version/flags)."""
    if p + 4 > len(data):
        raise UnsupportedMediaError("full box truncated at EOF")
    return data[p], p + 4


def _parse_stts(data: bytes, p: int, e: int) -> list:
    _, p = _full_box(data, p)
    cnt = _u32(data, p)
    p += 4
    if cnt > MAX_TABLE_ENTRIES or p + 8 * cnt > e:
        raise UnsupportedMediaError("stts overflows its box")
    return [(_u32(data, p + 8 * i), _u32(data, p + 8 * i + 4))
            for i in range(cnt)]


def _parse_u32_table(data: bytes, p: int, e: int, width: int = 4) -> list:
    _, p = _full_box(data, p)
    cnt = _u32(data, p)
    p += 4
    if cnt > MAX_TABLE_ENTRIES or p + width * cnt > e:
        raise UnsupportedMediaError("table overflows its box")
    rd = _u32 if width == 4 else _u64
    return [rd(data, p + width * i) for i in range(cnt)]


def _parse_stsc(data: bytes, p: int, e: int) -> list:
    _, p = _full_box(data, p)
    cnt = _u32(data, p)
    p += 4
    if cnt > MAX_TABLE_ENTRIES or p + 12 * cnt > e:
        raise UnsupportedMediaError("stsc overflows its box")
    return [(_u32(data, p + 12 * i), _u32(data, p + 12 * i + 4),
             _u32(data, p + 12 * i + 8)) for i in range(cnt)]


def _parse_stsz(data: bytes, p: int, e: int) -> tuple[int, list | None]:
    _, p = _full_box(data, p)
    const = _u32(data, p)
    cnt = _u32(data, p + 4)
    if cnt > MAX_SAMPLES:
        raise UnsupportedMediaError("stsz sample count too large")
    if const != 0:
        return cnt, None
    if p + 8 + 4 * cnt > e:
        raise UnsupportedMediaError("stsz overflows its box")
    return cnt, [_u32(data, p + 8 + 4 * i) for i in range(cnt)]


def _sample_table(data: bytes, stbl_p: int, stbl_e: int,
                  timescale: int) -> list[dict]:
    """Reconstruct per-sample (offset, size, ts_ms, sync) from the
    stbl child boxes — the spec's chunk-run indirection resolved to a
    flat list."""
    boxes = {typ: (p, e) for typ, p, e in iter_boxes(data, stbl_p, stbl_e)}
    for need in (b"stsz", b"stsc", b"stts"):
        if need not in boxes:
            raise UnsupportedMediaError(f"missing {need.decode()} box")
    if b"stco" in boxes:
        chunk_offs = _parse_u32_table(data, *boxes[b"stco"], width=4)
    elif b"co64" in boxes:
        chunk_offs = _parse_u32_table(data, *boxes[b"co64"], width=8)
    else:
        raise UnsupportedMediaError("missing stco/co64 box")

    n, per_sizes = _parse_stsz(data, *boxes[b"stsz"])
    if per_sizes is None:
        const = _u32(data, _full_box(data, boxes[b"stsz"][0])[1])
        per_sizes = [const] * n
    stsc = _parse_stsc(data, *boxes[b"stsc"])
    stts = _parse_stts(data, *boxes[b"stts"])
    sync = (set(_parse_u32_table(data, *boxes[b"stss"], width=4))
            if b"stss" in boxes else None)   # absent => every sample sync

    # stsc runs -> samples-per-chunk for each actual chunk.  Hostile
    # first_chunk values are clamped to the chunk table: a 2-entry stsc
    # declaring a 4e9-chunk gap must cost O(len(chunk_offs)), not an
    # O(gap) loop/allocation (chunks past the stco table are unusable
    # anyway)
    spc = []
    n_chunks = len(chunk_offs)
    for ri, (first, count, _sdi) in enumerate(stsc):
        last = (stsc[ri + 1][0] - 1 if ri + 1 < len(stsc) else n_chunks)
        last = min(last, n_chunks)
        # chunks BEFORE a gap-starting run are unmapped → 0 samples
        # (bounded by the chunk table): without the padding, chunk 1
        # would silently receive a later run's samples-per-chunk,
        # shifting every sample-to-chunk assignment after a hostile gap
        if first > len(spc) + 1:
            spc.extend([0] * (min(first - 1, n_chunks) - len(spc)))
        first = max(first, len(spc) + 1)
        for _c in range(first, last + 1):
            spc.append(count)
        if len(spc) >= n_chunks:
            break
    # decode timestamps from stts runs
    ts, t = [], 0
    for cnt, delta in stts:
        for _ in range(cnt):
            ts.append(t)
            t += delta
            if len(ts) > n:
                break
    if len(ts) < n:
        ts.extend([t] * (n - len(ts)))       # tolerate short stts

    out, si = [], 0
    for ci, coff in enumerate(chunk_offs):
        if si >= n or ci >= len(spc):
            break
        off = coff
        for _ in range(spc[ci]):
            if si >= n:
                break
            sz = per_sizes[si]
            out.append({
                "sample_idx": si,
                "offset": off,
                "size": sz,
                "ts_ms": (ts[si] * 1000) // timescale if timescale else 0,
                "sync": sync is None or (si + 1) in sync,
            })
            off += sz
            si += 1
    return out


def parse_mp4(payload: bytes) -> dict:
    """Parse an ISO BMFF payload into ``{brand, timescale, duration_ms,
    tracks: [{track_id, handler, codec, width, height, timescale,
    samples: [...]}]}``.  Raises :class:`UnsupportedMediaError` for
    non-BMFF bytes or truncated/degenerate structure."""
    data = payload or b""
    top = {typ: (p, e) for typ, p, e in iter_boxes(data, 0, len(data))}
    if b"moov" not in top:
        raise UnsupportedMediaError("no moov box (not ISO BMFF?)")
    brand = None
    if b"ftyp" in top:
        p, e = top[b"ftyp"]
        if p + 4 <= e:
            brand = data[p:p + 4].decode("latin-1")

    moov_p, moov_e = top[b"moov"]
    out = {"brand": brand, "timescale": 0, "duration_ms": 0, "tracks": []}
    mv = _find(data, moov_p, moov_e, b"mvhd")
    if mv:
        v, p = _full_box(data, mv[0])
        if v == 1:
            out["timescale"] = _u32(data, p + 16)
            dur = _u64(data, p + 20)
        else:
            out["timescale"] = _u32(data, p + 8)
            dur = _u32(data, p + 12)
        if out["timescale"]:
            out["duration_ms"] = (dur * 1000) // out["timescale"]

    for typ, tp, te in iter_boxes(data, moov_p, moov_e):
        if typ != b"trak":
            continue
        trk = {"track_id": None, "handler": None, "codec": None,
               "width": None, "height": None, "timescale": 0,
               "samples": []}
        tk = _find(data, tp, te, b"tkhd")
        if tk:
            v, p = _full_box(data, tk[0])
            trk["track_id"] = _u32(data, p + (16 if v == 1 else 8))
            # width/height: 16.16 fixed, last 8 bytes of the box
            if tk[1] - 8 >= p:
                trk["width"] = _u32(data, tk[1] - 8) >> 16
                trk["height"] = _u32(data, tk[1] - 4) >> 16
        mdia = _find(data, tp, te, b"mdia")
        if not mdia:
            continue
        md = _find(data, mdia[0], mdia[1], b"mdhd")
        if md:
            v, p = _full_box(data, md[0])
            trk["timescale"] = _u32(data, p + (16 if v == 1 else 8))
        hd = _find(data, mdia[0], mdia[1], b"hdlr")
        if hd:
            p = _full_box(data, hd[0])[1]
            trk["handler"] = data[p + 4:p + 8].decode("latin-1")
        minf = _find(data, mdia[0], mdia[1], b"minf")
        stbl = (_find(data, minf[0], minf[1], b"stbl") if minf else None)
        if stbl:
            sd = _find(data, stbl[0], stbl[1], b"stsd")
            if sd:
                p = _full_box(data, sd[0])[1]
                if _u32(data, p) >= 1 and p + 12 <= sd[1]:
                    trk["codec"] = data[p + 8:p + 12].decode("latin-1")
            trk["samples"] = _sample_table(
                data, stbl[0], stbl[1], trk["timescale"] or 1)
        out["tracks"].append(trk)
    if not out["tracks"]:
        raise UnsupportedMediaError("moov has no trak boxes")
    return out


def video_keyframes(payload: bytes, every_ms: int = 1000,
                    max_frames: int = 8) -> list[dict]:
    """Sync-sample (keyframe) selection for the FIRST video track:
    greedy pick of sync samples spaced ≥ ``every_ms`` apart, capped at
    ``max_frames``, each with real byte range + the frame bytes.  This
    is the container half of frame sampling; pixel decode of the
    returned ``data`` is the codec plug-in's job."""
    info = parse_mp4(payload)
    vid = next((t for t in info["tracks"] if t["handler"] == "vide"),
               None)
    if vid is None:
        raise UnsupportedMediaError("no video track")
    picked, next_ts = [], None
    for s in vid["samples"]:
        if not s["sync"]:
            continue
        if next_ts is not None and s["ts_ms"] < next_ts:
            continue
        end = s["offset"] + s["size"]
        if end > len(payload):
            continue                      # truncated mdat: skip, not die
        picked.append({**s, "codec": vid["codec"],
                       "data": payload[s["offset"]:end]})
        next_ts = s["ts_ms"] + every_ms
        if len(picked) >= max_frames:
            break
    return picked


# ---------------------------------------------------------------------------
# minimal writer (test fixtures; moov after mdat so offsets are known)
# ---------------------------------------------------------------------------

def _box(typ: bytes, payload: bytes) -> bytes:
    return _U32.pack(8 + len(payload)) + typ + payload


def _full(typ: bytes, version: int, payload: bytes) -> bytes:
    return _box(typ, bytes([version, 0, 0, 0]) + payload)


def encode_mp4(frames: list[bytes], fps: int = 10, width: int = 64,
               height: int = 48, timescale: int = 1000,
               sync_every: int = 4, chunking: list[int] | None = None,
               codec: bytes = b"mp4v", use_co64: bool = False) -> bytes:
    """Write a minimal single-video-track MP4 whose mdat holds
    ``frames`` back to back.  ``chunking`` is the samples-per-chunk
    split (default: one chunk holding everything); ``sync_every`` marks
    frames 1, 1+k, ... as sync samples.  Exercises stsc runs, stss,
    stco/co64 and constant-vs-per-sample stsz on the parse side."""
    if not frames:
        raise ValueError("need at least one frame")
    if chunking is None:
        chunking = [len(frames)]
    if sum(chunking) != len(frames):
        raise ValueError("chunking must sum to the frame count")
    delta = timescale // fps
    ftyp = _box(b"ftyp", b"isom" + _U32.pack(0x200) + b"isomiso2")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    base = len(ftyp) + 8                  # first sample's file offset

    # chunk offsets
    offs, o, fi = [], base, 0
    for c in chunking:
        offs.append(o)
        for _ in range(c):
            o += len(frames[fi])
            fi += 1
    # stsc runs (collapse equal neighbours, as the spec intends)
    runs = []
    for ci, c in enumerate(chunking):
        if runs and runs[-1][1] == c:
            continue
        runs.append((ci + 1, c, 1))

    stts = _full(b"stts", 0, _U32.pack(1) + _U32.pack(len(frames))
                 + _U32.pack(delta))
    stss_nums = [i + 1 for i in range(len(frames)) if i % sync_every == 0]
    stss = _full(b"stss", 0, _U32.pack(len(stss_nums))
                 + b"".join(_U32.pack(x) for x in stss_nums))
    stsc = _full(b"stsc", 0, _U32.pack(len(runs))
                 + b"".join(_U32.pack(a) + _U32.pack(b) + _U32.pack(c)
                            for a, b, c in runs))
    sizes = [len(f) for f in frames]
    if len(set(sizes)) == 1:
        stsz = _full(b"stsz", 0, _U32.pack(sizes[0])
                     + _U32.pack(len(frames)))
    else:
        stsz = _full(b"stsz", 0, _U32.pack(0) + _U32.pack(len(frames))
                     + b"".join(_U32.pack(s) for s in sizes))
    if use_co64:
        stco = _full(b"co64", 0, _U32.pack(len(offs))
                     + b"".join(_U64.pack(x) for x in offs))
    else:
        stco = _full(b"stco", 0, _U32.pack(len(offs))
                     + b"".join(_U32.pack(x) for x in offs))
    entry = (_U32.pack(86) + codec + b"\x00" * 6 + struct.pack(">H", 1)
             + b"\x00" * 16 + struct.pack(">HH", width, height)
             + b"\x00" * 50)
    stsd = _full(b"stsd", 0, _U32.pack(1) + entry[:86])
    stbl = _box(b"stbl", stsd + stts + stss + stsc + stsz + stco)

    dur = len(frames) * delta
    mdhd = _full(b"mdhd", 0, _U32.pack(0) * 2 + _U32.pack(timescale)
                 + _U32.pack(dur) + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, _U32.pack(0) + b"vide" + b"\x00" * 12
                 + b"v\x00")
    vmhd = _full(b"vmhd", 0, b"\x00" * 8)
    dref = _full(b"dref", 0, _U32.pack(1) + _full(b"url ", 0, b"")[:12])
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    mat = (_U32.pack(0x10000) + _U32.pack(0) * 3 + _U32.pack(0x10000)
           + _U32.pack(0) * 3 + _U32.pack(0x40000000))
    tkhd = _full(b"tkhd", 0, _U32.pack(0) * 2 + _U32.pack(1)
                 + _U32.pack(0) + _U32.pack(dur) + _U32.pack(0) * 2
                 + struct.pack(">HHHH", 0, 0, 0, 0) + mat
                 + _U32.pack(width << 16) + _U32.pack(height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, _U32.pack(0) * 2 + _U32.pack(timescale)
                 + _U32.pack(dur) + _U32.pack(0x10000)
                 + struct.pack(">H", 0x100) + b"\x00" * 10 + mat
                 + b"\x00" * 24 + _U32.pack(2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
