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
import math
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


# ---- baseline JPEG (round 6, VERDICT r5 #7) --------------------------
# PNG's zlib path never exercises the dominant web-crawl image format's
# decode machinery: entropy (Huffman) decoding and the DCT transform
# domain.  This section adds a clean-room baseline-sequential grayscale
# JPEG encoder + decoder from the public ITU T.81 spec (Annex K example
# quantization/Huffman tables).  The verification lever is that the
# ENTROPY LAYER IS LOSSLESS over quantized DCT coefficients: the
# encoder reaches the coefficients via pixels → forward DCT → quantize
# (never touching Huffman), while the decoder reaches the same
# integers via file bytes → marker parse → Huffman decode (never
# touching the DCT).  The oracle states coefficient facts from the
# first route at SQL-build time; Spark recomputes them by the second
# route over the scanned bytes — agreement proves the entropy-decode
# path with no shared arithmetic beyond the definition of the file.

JPEG_DIR = os.path.join(FIXTURE_ROOT, "jpg")


def jpeg_width(doc_id: int) -> int:
    return 16 + (doc_id * 13) % 48


def jpeg_height(doc_id: int) -> int:
    return 16 + (doc_id * 5) % 48


# ITU T.81 Annex K.1 luminance quantization table (natural row-major
# order) and K.3 typical luminance Huffman tables.
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# zigzag position → natural (row-major) index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

_DCT_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
    for u in range(8)
]
_DCT_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7


def _canonical_codes(bits: list, vals: list) -> dict:
    """symbol → (code, length) per the canonical DHT construction."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


DC_CODES = _canonical_codes(DC_BITS, DC_VALS)
AC_CODES = _canonical_codes(AC_BITS, AC_VALS)


def quant_blocks_of(img) -> list:
    """Quantized-coefficient blocks of a LEVEL-SHIFTED padded image
    (2-D int array, already edge-replicated to 8-multiples) via the
    FORWARD route (DCT → quantize), natural order per block; block
    scan order is left-to-right, top-to-bottom.

    Determinism note: the encoder AND the oracle stats both flow
    through THIS function, and the decoder never recomputes a DCT —
    so the float summation order only has to agree with itself.
    """
    import numpy as np

    # T[u, x] = 0.5 * C(u) * cos((2x+1)uπ/16) — the orthonormal 8-DCT.
    t = 0.5 * np.array(_DCT_COS) * np.array(_DCT_C)[:, None]
    q = np.array(QUANT_LUMA, dtype=np.float64).reshape(8, 8)
    blocks = []
    for by in range(0, img.shape[0], 8):
        for bx in range(0, img.shape[1], 8):
            blk = img[by : by + 8, bx : bx + 8].astype(np.float64)
            coeff = t @ blk @ t.T  # rows index v (y-freq), cols u (x-freq)
            quant = np.floor(coeff / q + 0.5).astype(np.int64)
            blocks.append([int(quant[v, u]) for v in range(8) for u in range(8)])
    return blocks


def padded_image(pixels, w: int, h: int):
    """Level-shift + edge-replicate an arbitrary pixel grid (callable
    (x, y) -> 0..255) to 8-multiple dimensions."""
    import numpy as np

    xs = np.minimum(np.arange((w + 7) // 8 * 8), w - 1)
    ys = np.minimum(np.arange((h + 7) // 8 * 8), h - 1)
    return (
        np.array([[pixels(int(x), int(y)) for x in xs] for y in ys],
                 dtype=np.int64)
        - 128
    )


def jpeg_quant_blocks(doc_id: int) -> list:
    """Fixture-pixel wrapper over :func:`quant_blocks_of` (numpy
    builds the formula image directly — vectorized for the import-time
    oracle build over all 100 fixtures)."""
    import numpy as np

    w, h = jpeg_width(doc_id), jpeg_height(doc_id)
    xs = np.minimum(np.arange((w + 7) // 8 * 8), w - 1)
    ys = np.minimum(np.arange((h + 7) // 8 * 8), h - 1)
    img = (3 * xs[None, :] + 7 * ys[:, None] + doc_id) % 256 - 128
    return quant_blocks_of(img)


def jpeg_coeff_stats(doc_id: int) -> tuple:
    """(n_blocks, dc_sum, ac_nonzero) from the forward route — the
    oracle's closed form, no Huffman involved."""
    blocks = jpeg_quant_blocks(doc_id)
    dc_sum = sum(b[0] for b in blocks)
    ac_nonzero = sum(1 for b in blocks for c in b[1:] if c != 0)
    return len(blocks), dc_sum, ac_nonzero


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc, self.nbits = 0, 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


def _magnitude(v: int) -> tuple:
    """JPEG magnitude category: (size, raw bits) with the one's-
    complement negative encoding of F.1.2.1."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, v if v >= 0 else v + (1 << size) - 1


def _dht_segment(tc_th: int, bits: list, vals: list) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def jpeg_bytes_of(blocks: list, w: int, h: int) -> bytes:
    """Spec-valid baseline-sequential grayscale JFIF from pre-quantized
    coefficient blocks: zigzag → DC-differential + run-length AC
    Huffman coding, byte-stuffed."""
    bw = _BitWriter()
    prev_dc = 0
    for block in blocks:
        zz = [block[ZIGZAG[i]] for i in range(64)]
        size, bits_v = _magnitude(zz[0] - prev_dc)
        prev_dc = zz[0]
        code, length = DC_CODES[size]
        bw.write(code, length)
        if size:
            bw.write(bits_v, size)
        run = 0
        for coeff in zz[1:]:
            if coeff == 0:
                run += 1
                continue
            while run > 15:
                zrl, zl = AC_CODES[0xF0]
                bw.write(zrl, zl)
                run -= 16
            size, bits_v = _magnitude(coeff)
            code, length = AC_CODES[run * 16 + size]
            bw.write(code, length)
            bw.write(bits_v, size)
            run = 0
        if run:
            eob, el = AC_CODES[0x00]
            bw.write(eob, el)
    zz_quant = bytes(QUANT_LUMA[ZIGZAG[i]] for i in range(64))
    return (
        b"\xff\xd8"  # SOI
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0
        + b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_quant  # DQT
        + b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
        + b"\x01\x11\x00"  # SOF0: 1 component, no subsampling, Tq=0
        + _dht_segment(0x00, DC_BITS, DC_VALS)
        + _dht_segment(0x10, AC_BITS, AC_VALS)
        + b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"
        + bw.flush()
        + b"\xff\xd9"  # EOI
    )


def jpeg_bytes(doc_id: int) -> bytes:
    """Fixture wrapper: the real pipeline (level shift → 8×8 DCT →
    Annex-K quantization) over the formula pixels, then the entropy
    encoder."""
    return jpeg_bytes_of(
        jpeg_quant_blocks(doc_id), jpeg_width(doc_id), jpeg_height(doc_id)
    )


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy stream")
                self.pos += 1  # consume the stuffed 0x00
            self.acc, self.nbits = b, 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode(reader: "_BitReader", table: dict) -> int:
    """table: (code, length) → symbol, decoded bit-serially (max 16)."""
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """F.2.2.1 EXTEND: map raw magnitude bits back to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_coeffs(data: bytes) -> tuple:
    """Parse a baseline grayscale JFIF and Huffman-decode the quantized
    coefficient blocks — the REVERSE route (bytes → markers → entropy
    decode), no DCT anywhere.  Returns (width, height, blocks) with
    each block in natural order, DC differences resolved.

    Clean-room decoder for the subset this engine emits (baseline
    sequential, one 8-bit component, no restart markers); anything else
    raises rather than guessing — a real corpus swaps in libjpeg at
    this exact seam, like decode_png's PIL note."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG SOI")
    pos, width, height = 2, None, None
    dc_table: dict = {}
    ac_table: dict = {}
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xC0:  # SOF0 baseline
            depth, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if (depth, ncomp) != (8, 1):
                raise ValueError("decoder supports 8-bit grayscale only")
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("decoder supports baseline sequential only")
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            tpos = 0
            while tpos < len(body):
                tc_th = body[tpos]
                bits = list(body[tpos + 1 : tpos + 17])
                nvals = sum(bits)
                vals = list(body[tpos + 17 : tpos + 17 + nvals])
                table = {
                    (code, length): sym
                    for sym, (code, length) in _canonical_codes(
                        bits, vals
                    ).items()
                }
                if tc_th >> 4 == 0:
                    dc_table = table
                else:
                    ac_table = table
                tpos += 17 + nvals
        elif marker == 0xDA:  # SOS: entropy data follows the header
            scan = data[pos + 2 + seglen :]
            break
        pos += 2 + seglen
    if width is None or scan is None or not dc_table or not ac_table:
        raise ValueError("missing SOF/SOS/DHT")
    n_blocks = ((width + 7) // 8) * ((height + 7) // 8)
    reader = _BitReader(scan)
    blocks, prev_dc = [], 0
    for _ in range(n_blocks):
        zz = [0] * 64
        size = _huff_decode(reader, dc_table)
        prev_dc += _extend(reader.read_bits(size), size)
        zz[0] = prev_dc
        k = 1
        while k < 64:
            sym = _huff_decode(reader, ac_table)
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0x0F
            if size == 0:
                if run != 15:
                    raise ValueError("invalid AC symbol")
                k += 16  # ZRL
                continue
            k += run
            if k > 63:
                raise ValueError("AC run past block end")
            zz[k] = _extend(reader.read_bits(size), size)
            k += 1
        block = [0] * 64
        for i in range(64):
            block[ZIGZAG[i]] = zz[i]
        blocks.append(block)
    return width, height, blocks


def ensure_jpeg_dir() -> str:
    return _ensure_dir(JPEG_DIR, "jpg", jpeg_bytes)


def jpeg_oracle_values_sql() -> str:
    """``(VALUES ...)`` rows of (doc_id, sha_hex, n_bytes, width,
    height, n_blocks, dc_sum, ac_nonzero): sha/bytes via hashlib over
    the generated file, coefficient stats via the FORWARD (DCT) route
    — both independent of the Huffman decode Spark performs."""
    rows = []
    for i in range(N_FILES):
        data = jpeg_bytes(i)
        n_blocks, dc_sum, ac_nonzero = jpeg_coeff_stats(i)
        rows.append(
            f"({i}, '{hashlib.sha256(data).hexdigest()}', {len(data)}, "
            f"{jpeg_width(i)}, {jpeg_height(i)}, {n_blocks}, {dc_sum}, "
            f"{ac_nonzero})"
        )
    return "(VALUES " + ", ".join(rows) + ")"
