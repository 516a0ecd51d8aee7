"""Multimodal column support: opaque binary payloads + typed metadata.

The decode here is a pure-Python struct read of PUBLIC container formats
(PNG: W3C PNG spec, 8-byte signature + IHDR chunk; JPEG: ITU-T T.81
marker segments, dimensions from the first SOFn frame header) — no image
libraries. Full pixel decode / resize / frame-sample are feature
extraction, not metadata, and stay stubbed in this container (see
``pixel_decode_stub``); the Spark-side plumbing (binary column schema,
Arrow batching, nullable outputs) is the real thing.
"""

from __future__ import annotations

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# SOFn markers that carry frame dimensions (T.81 table B.1). C4=DHT,
# C8=JPG extension, CC=DAC are not frame headers.
_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_meta(data: bytes | None) -> tuple[str, int, int] | None:
    """(format, width, height) from a binary payload, or None when the
    payload is not a recognizable image (malformed input must never
    raise — containment is the contract at 10^12 blobs)."""
    if not data:
        return None
    if data[:8] == PNG_SIG:
        # signature + IHDR length(4) + type(4) must be first chunk
        if len(data) >= 24 and data[12:16] == b"IHDR":
            w = int.from_bytes(data[16:20], "big")
            h = int.from_bytes(data[20:24], "big")
            return ("png", w, h)
        return None
    if data[:2] == b"\xff\xd8":
        return _jpeg_dims(data)
    return None


def _jpeg_dims(data: bytes) -> tuple[str, int, int] | None:
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        # standalone markers carry no length word (T.81 B.1.1.3): SOI,
        # RSTn, and TEM (0x01)
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        seglen = int.from_bytes(data[i + 2 : i + 4], "big")
        if seglen < 2:
            return None
        if marker in _SOF_MARKERS:
            # payload: precision(1) height(2) width(2) ...
            if i + 9 > n:
                return None
            h = int.from_bytes(data[i + 5 : i + 7], "big")
            w = int.from_bytes(data[i + 7 : i + 9], "big")
            return ("jpeg", w, h)
        i += 2 + seglen
    return None


def parse_audio_meta(data: bytes | None) -> tuple[str, int, int, int] | None:
    """(format, channels, sample_rate, n_frames) from a RIFF/WAVE
    container (public spec: RIFF chunks; fmt  = PCM header, data = sample
    bytes). Pure struct reads; malformed input returns None, never
    raises."""
    if not data or len(data) < 12:
        return None
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    n = len(data)
    channels = sample_rate = block_align = None
    data_size = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = pos + 8
        # the chunk's DECLARED size must cover the 16 PCM header bytes —
        # a short fmt chunk must not silently read the next chunk's bytes
        if cid == b"fmt " and size >= 16 and body + 16 <= n:
            channels = int.from_bytes(data[body + 2 : body + 4], "little")
            sample_rate = int.from_bytes(data[body + 4 : body + 8], "little")
            block_align = int.from_bytes(data[body + 12 : body + 14], "little")
        elif cid == b"data":
            data_size = size
        pos = body + size + (size & 1)  # chunks are word-aligned
    if not channels or not sample_rate or not block_align or data_size is None:
        return None
    return ("wav", channels, sample_rate, data_size // block_align)


def parse_video_meta(data: bytes | None) -> tuple[str, int, int] | None:
    """(format, timescale, duration) from an ISO BMFF / MP4 container
    (public spec: ISO 14496-12 box structure; ftyp brand check, then the
    moov/mvhd movie header). Version 0 and 1 mvhd boxes supported.
    Malformed input returns None, never raises."""
    if not data or len(data) < 12:
        return None
    if data[4:8] != b"ftyp":
        return None
    pos = 0
    n = len(data)
    while pos + 8 <= n:
        size = int.from_bytes(data[pos : pos + 4], "big")
        btype = data[pos + 4 : pos + 8]
        if size < 8:
            return None  # size==1 (64-bit) unsupported, 0 = to-EOF: bail
        if btype == b"moov":
            return _mvhd(data, pos + 8, min(pos + size, n))
        pos += size
    return None


def _mvhd(data: bytes, pos: int, end: int) -> tuple[str, int, int] | None:
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        btype = data[pos + 4 : pos + 8]
        if size < 8:
            return None
        if btype == b"mvhd":
            body = pos + 8
            if body + 4 > end:
                return None
            version = data[body]
            if version == 0:
                if body + 20 > end:
                    return None
                timescale = int.from_bytes(data[body + 12 : body + 16], "big")
                duration = int.from_bytes(data[body + 16 : body + 20], "big")
            else:  # version 1: 64-bit times
                if body + 32 > end:
                    return None
                timescale = int.from_bytes(data[body + 20 : body + 24], "big")
                duration = int.from_bytes(data[body + 24 : body + 32], "big")
            return ("mp4", timescale, duration)
        pos += size
    return None


# --- PDF (north rule: "PDF/layout parse") -----------------------------------
#
# Scan-based, recovery-oriented PDF reading (public spec: ISO 32000-1).
# Crawl PDFs are routinely truncated or have broken xref tables, so the
# extractor deliberately does NOT trust the cross-reference machinery: it
# scans for page objects and content streams directly, decompressing
# FlateDecode streams with stdlib zlib and decoding the text-showing
# operators (Tj / TJ / ') with PDF string-escape semantics. Malformed
# input degrades to partial or empty output, never an exception.

import re as _re
import zlib as _zlib

_PDF_PAGE_RE = _re.compile(rb"/Type\s*/Page(?![a-zA-Z])")
# (string) Tj|'  and  [ ... ] TJ show operators
_PDF_STR = rb"\((?:[^()\\]|\\.)*\)"
_PDF_SHOW_RE = _re.compile(
    rb"(?:(" + _PDF_STR + rb")\s*(?:Tj|'))|(?:\[((?:[^\[\]\\]|\\.)*)\]\s*TJ)"
)
_PDF_INNER_STR = _re.compile(_PDF_STR)
_PDF_ESC = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08", b"f": b"\x0c",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _pdf_unescape(raw: bytes) -> str:
    """Decode a parenthesized PDF string body per ISO 32000-1 7.3.4.2."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        i += 1
        if i >= n:
            break
        e = raw[i : i + 1]
        if e in _PDF_ESC:
            out += _PDF_ESC[e]
            i += 1
        elif e.isdigit():  # up to 3 octal digits
            j = i
            while j < min(i + 3, n) and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i:j], 8) & 0xFF)
            i = j
        elif e == b"\n":
            i += 1  # line continuation
        else:
            out += e
            i += 1
    return out.decode("latin-1")


def parse_pdf_meta(data: bytes | None) -> tuple[str, str, int] | None:
    """(format, version, n_pages) from a PDF payload; None when the
    payload is not a PDF. Page count = /Type /Page object scan (xref-free
    on purpose — see module comment)."""
    if not data or not data.startswith(b"%PDF-"):
        return None
    version = data[5:8].decode("ascii", errors="replace")
    return ("pdf", version, len(_PDF_PAGE_RE.findall(data)))


def extract_pdf_text(data: bytes | None) -> str:
    """Concatenated text-show strings from every content stream
    (uncompressed or FlateDecode), in document byte order, joined with
    single spaces. Undecodable streams are skipped, never raised."""
    if not data or not data.startswith(b"%PDF-"):
        return ""
    parts: list[str] = []
    pos = 0
    n = len(data)
    while True:
        i = data.find(b"stream", pos)
        if i == -1:
            break
        body_start = i + 6
        if data[body_start : body_start + 2] == b"\r\n":
            body_start += 2
        elif data[body_start : body_start + 1] in (b"\n", b"\r"):
            body_start += 1
        end = data.find(b"endstream", body_start)
        if end == -1:
            end = n
        body = data[body_start:end]
        pos = end + 9
        # the stream's dict immediately precedes `stream`
        head = data[max(0, i - 512) : i]
        if b"/FlateDecode" in head:
            try:
                body = _zlib.decompress(body)
            except Exception:
                continue
        for m in _PDF_SHOW_RE.finditer(body):
            if m.group(1) is not None:
                parts.append(_pdf_unescape(m.group(1)[1:-1]))
            else:
                for sm in _PDF_INNER_STR.finditer(m.group(2)):
                    parts.append(_pdf_unescape(sm.group(0)[1:-1]))
    return " ".join(p for p in parts if p)


def pixel_decode_stub(data: bytes) -> None:
    """Pixel-level decode needs an image library this container doesn't
    ship; the metadata path above never calls this."""
    raise NotImplementedError(
        "pixel decode is out of scope here — plug in an image library "
        "and swap this stub"
    )


# --- pixel pipeline: FAKE decode, REAL resize/features ----------------------
#
# The decode step below is a clearly-marked DETERMINISTIC FAKE (no image
# libs in this container): it tiles the md5 digest of the payload's
# uppercase hex into an (h, w) uint8 luma grid. Everything DOWNSTREAM —
# nearest-neighbor resize and the feature statistics — is real numpy and
# works unchanged the day fake_decode_luma is swapped for PIL/cv2.
# Determinism is the point: the DuckDB oracle recomputes the resized
# pixel values in closed form, so the whole Spark-side pipeline (blob
# synthesis -> header parse -> decode -> resize -> features, batch
# shapes and null handling included) is value-hash-checked end to end.


def fake_decode_luma(data: bytes, w: int, h: int):
    """FAKE decoder: (h, w) uint8 grid with
    pixel[r, c] = md5(hex(data).upper())[(r*w + c) % 16]."""
    import hashlib

    import numpy as np

    digest = hashlib.md5(data.hex().upper().encode()).digest()
    row = np.frombuffer(digest, dtype=np.uint8)
    idx = (np.arange(h)[:, None] * w + np.arange(w)[None, :]) % 16
    return row[idx]


def resize_nearest(arr, out_h: int, out_w: int):
    """REAL nearest-neighbor resize (pure numpy indexing):
    out[r, c] = arr[r*H//out_h, c*W//out_w]."""
    import numpy as np

    h, w = arr.shape
    rr = (np.arange(out_h) * h) // out_h
    cc = (np.arange(out_w) * w) // out_w
    return arr[rr][:, cc]


def _floor4(x: float) -> float:
    """4dp truncation — FLOOR, not round: Python round() is banker's
    while SQL round() is half-away-from-zero, and pixel means (int/64)
    land EXACTLY on .00005 boundaries whenever the sum is 2 mod 4, so
    rounding would diverge between engines; floor never does."""
    import math

    return math.floor(x * 10000) / 10000


def luma_features(arr) -> tuple[float, float]:
    """REAL features: (mean, population std) of the luma grid, floored
    to 4dp — the sums stay exact in float64 so both engines agree
    bit-for-bit (see _floor4 for why not round)."""
    import numpy as np

    flat = arr.astype(np.float64)
    n = flat.size
    s = float(flat.sum())
    sq = float((flat * flat).sum())
    mean = s / n
    var = sq / n - mean * mean
    return _floor4(mean), _floor4(max(var, 0.0) ** 0.5)


def frame_sample_offsets(duration_ms: int, n: int) -> list[int]:
    """Deterministic frame-sample timestamps: the midpoints of ``n``
    equal slices of the duration (the standard keyframe-thumbnail
    policy), integer ms."""
    return [(duration_ms * (2 * k + 1)) // (2 * n) for k in range(n)]


def fake_sample_stat(payload_hex: str, k: int) -> float:
    """FAKE per-sample statistic shared by video_frames (frame luma
    mean) and audio_windows (window RMS): mean of the 16
    md5(hex || '-' || k) digest bytes, floored 4dp — the closed form
    both DuckDB oracles recompute."""
    import hashlib

    dg = hashlib.md5(f"{payload_hex}-{k}".encode()).digest()
    return _floor4(sum(dg) / 16)
