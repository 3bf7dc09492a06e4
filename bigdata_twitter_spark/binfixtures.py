"""Deterministic TRUE-BINARY multimodal fixtures (VERDICT r4 #7).

The image/audio operators' earlier fixtures were text-derived byte
stand-ins; a user with real JPEG frames exercises codepaths (header
parsing, decode failures, compressed payloads) the stand-ins cannot.
This module generates REAL, spec-valid media files — PNG (public PNG
spec: signature, CRC-checked IHDR/IDAT/IEND chunks, zlib-compressed
scanlines) and WAV (RIFF/PCM via the stdlib ``wave`` module) — as a
pure function of ``doc_id``, entirely offline.

Determinism is the verification lever: because every byte derives from
``doc_id`` alone, the DuckDB oracle can independently recompute
file-level facts (byte length via ``read_blob`` over the same files,
sha-256 via Python hashlib at SQL-build time, dimensions/sample counts
via the closed-form formulas below) while Spark recomputes them the
honest way — by parsing and decoding the actual bytes it scanned.
Equality then proves the parse/decode path, not the formula.

The fixture set is intentionally scale-independent (``N_FILES`` files,
ids 0..N-1) at a FIXED path: oracle SQL is a static string, so the
path it reads cannot vary with ``sf_dir``.  Corpus-sized Arrow
plumbing remains covered by the full-corpus text-payload keys
(``multimodal_bytes`` / ``multimodal_decode_stub`` /
``multimodal_frame_sample``).
"""

from __future__ import annotations

import array
import hashlib
import io
import os
import struct
import tempfile
import wave
import zlib

N_FILES = 100

FIXTURE_ROOT = os.path.join(tempfile.gettempdir(), "bdt_spark_binfix_v1")
PNG_DIR = os.path.join(FIXTURE_ROOT, "png")
WAV_DIR = os.path.join(FIXTURE_ROOT, "wav")

# ---- generation formulas (the oracle's closed forms) -----------------
# Image: 8-bit grayscale, dims 16..64 per side, pixel = linear-ramp mod.
# Audio: 16 kHz mono 16-bit PCM, 1600..4799 samples, LCG-ish ramp.


def png_width(doc_id: int) -> int:
    return 16 + (doc_id * 7) % 49


def png_height(doc_id: int) -> int:
    return 16 + (doc_id * 11) % 49


def pixel(x: int, y: int, doc_id: int) -> int:
    return (3 * x + 7 * y + doc_id) % 256


def wav_n_samples(doc_id: int) -> int:
    return 1600 + (doc_id * 37) % 3200


def wav_sample(i: int, doc_id: int) -> int:
    return ((doc_id * 31 + i * 17) % 65536) - 32768


# ---- real encoders ---------------------------------------------------


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    body = tag + data
    return (
        struct.pack(">I", len(data))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def png_bytes(doc_id: int) -> bytes:
    """Spec-valid 8-bit grayscale PNG (filter type 0 scanlines)."""
    w, h = png_width(doc_id), png_height(doc_id)
    raw = b"".join(
        b"\x00" + bytes(pixel(x, y, doc_id) for x in range(w))
        for y in range(h)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def wav_bytes(doc_id: int) -> bytes:
    """RIFF/PCM WAV, 16 kHz mono 16-bit, via the stdlib writer."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        samples = array.array(
            "h", [wav_sample(i, doc_id) for i in range(wav_n_samples(doc_id))]
        )
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


# ---- real decoders (the Spark-side path under test) ------------------


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Parse + decode a grayscale filter-0 PNG, verifying chunk CRCs.

    Returns (width, height, pixel_bytes row-major).  This is a genuine
    clean-room decoder for the PNG subset this engine emits (8-bit
    grayscale, filter type 0); any other bit depth / color type /
    filter raises rather than guessing — a real corpus would swap in a
    full decoder (PIL) at this exact seam.
    """
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos, width, height, idat = 8, None, None, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color = struct.unpack(">IIBB", body[:10])
            if (depth, color) != (8, 0):
                raise ValueError("decoder supports 8-bit grayscale only")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    stride = width + 1
    rows = []
    for y in range(height):
        scanline = raw[y * stride : (y + 1) * stride]
        if scanline[0] != 0:
            raise ValueError("decoder supports filter type 0 only")
        rows.append(scanline[1:])
    return width, height, b"".join(rows)


def decode_wav(data: bytes) -> tuple[int, int, array.array]:
    """Parse a PCM WAV via the stdlib reader; returns
    (framerate, n_samples, int16 samples)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        if (wf.getnchannels(), wf.getsampwidth()) != (1, 2):
            raise ValueError("decoder supports mono 16-bit PCM only")
        n = wf.getnframes()
        samples = array.array("h")
        samples.frombytes(wf.readframes(n))
        return wf.getframerate(), n, samples


# ---- fixture materialization ----------------------------------------


def _ensure_dir(path: str, ext: str, gen) -> str:
    """Idempotently materialize the fixture files.

    Each file is staged and published with ``os.replace`` (atomic), so
    concurrent generators — which by determinism produce identical
    bytes — can interleave without a reader ever seeing a torn file.
    """
    marker = os.path.join(path, "_ready")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    for i in range(N_FILES):
        final = os.path.join(path, f"{i}.{ext}")
        if os.path.exists(final):
            continue
        fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
        with os.fdopen(fd, "wb") as fh:
            fh.write(gen(i))
        os.replace(tmp, final)
    with open(marker, "w") as fh:
        fh.write("ok")
    return path


def ensure_png_dir() -> str:
    return _ensure_dir(PNG_DIR, "png", png_bytes)


# ---- deterministic corruption (the decode-error fixture) -------------

MIXED_DIR = os.path.join(FIXTURE_ROOT, "png_mixed")
CORRUPT_MOD = 10  # ids with doc_id % 10 == 3 are corrupted
CORRUPT_RESIDUE = 3


def is_corrupt(doc_id: int) -> bool:
    return doc_id % CORRUPT_MOD == CORRUPT_RESIDUE


def mixed_png_bytes(doc_id: int) -> bytes:
    """Valid PNG, except ids selected by :func:`is_corrupt` get one
    IDAT payload byte flipped — the file still LOOKS like a PNG
    (signature, chunk layout intact) but fails CRC verification, the
    realistic at-scale corruption mode (bit rot, truncated uploads
    caught by checksums, not by file extension)."""
    data = png_bytes(doc_id)
    if not is_corrupt(doc_id):
        return data
    corrupted = bytearray(data)
    corrupted[data.index(b"IDAT") + 10] ^= 0xFF
    return bytes(corrupted)


def ensure_mixed_png_dir() -> str:
    return _ensure_dir(MIXED_DIR, "png", mixed_png_bytes)


def ensure_wav_dir() -> str:
    return _ensure_dir(WAV_DIR, "wav", wav_bytes)


def png_sha_values_sql() -> str:
    """``(VALUES ...)`` rows of (doc_id, sha_hex, width, height) computed
    at SQL-build time with hashlib — an engine independent of Spark's
    JVM sha2 over the scanned bytes."""
    rows = ", ".join(
        f"({i}, '{hashlib.sha256(png_bytes(i)).hexdigest()}', "
        f"{png_width(i)}, {png_height(i)})"
        for i in range(N_FILES)
    )
    return f"(VALUES {rows})"
