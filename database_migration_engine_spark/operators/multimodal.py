"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode/feature-extraction runs as Arrow-batched ``mapInPandas``
so bytes move columnar and the Python stage sees whole batches, never
rows.

Decode modes (r02 VERDICT item 7; JPEG added r03): ``mode="real"``
genuinely parses PNG headers (IHDR width/height via ``struct``), JPEG
headers (SOFn segment walk — baseline and progressive), and WAV headers
(stdlib ``wave``) — no PIL/librosa needed; payloads in any OTHER format
still raise NotImplementedError at the exact seam where full media
libraries would go. Full PIXEL/SAMPLE decode (the ``pixel_stats`` /
``avi_frame_stats`` path) covers 24bpp BMP, PCM WAV, 8-bit PNG
(zlib inflate + unfilter), palette GIF (complete LZW), baseline AND
huffman-progressive JPEG (entropy decode + IDCT; progressive scans
accumulate per T.81 Annex G) and multi-frame uncompressed-DIB AVI
video — the remaining seam is MP3 sample decode, compressed video
codecs, and JPEG's arithmetic/hierarchical/12-bit modes.
``mode="fake"`` produces deterministic hash-derived features with the
real batch shape for format-agnostic plumbing tests. Everything
Spark-side — schema, partitioning, UDF signature, batch iteration — is
real and tested in both modes.
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import wave
import zlib
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import ensure_worker_imports

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), nullable=False),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.IntegerType()),
                    T.StructField("source_uri", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)

_MODALITIES = ("image", "audio", "video")


def synth_assets(spark: SparkSession, n: int = 200) -> DataFrame:
    """Deterministic synthetic asset table (JVM-side: range → sha2 → unhex,
    no Python in the generation path)."""
    return spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(
            F.lit(list(_MODALITIES)), (F.col("id") % 3 + 1).cast("int")
        ).alias("modality"),
        # payload: 3 chained sha2 digests = 96 deterministic bytes
        F.unhex(
            F.concat(
                F.sha2(F.col("id").cast("string"), 256),
                F.sha2(F.concat(F.col("id").cast("string"), F.lit("x")), 256),
                F.sha2(F.concat(F.col("id").cast("string"), F.lit("y")), 256),
            )
        ).alias("payload"),
        F.struct(
            F.concat(F.lit("application/fake-"),
                     F.element_at(F.lit(list(_MODALITIES)),
                                  (F.col("id") % 3 + 1).cast("int"))).alias("mime"),
            F.lit(96).cast("int").alias("n_bytes"),
            F.concat(F.lit("synthetic://asset/"), F.col("id")).alias("source_uri"),
        ).alias("meta"),
    )


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def png_pixel(x: int, y: int) -> int:
    """Deterministic grayscale value of synthetic pixel (x, y) — the
    generative formula the DuckDB oracle recomputes analytically (the
    PNG analog of ``bmp_pixel``)."""
    return (x * 3 + y * 7) % 256


def make_png(
    width: int, height: int, gray: int = 128, pattern: bool = False
) -> bytes:
    """Minimal valid grayscale PNG from pure stdlib (struct + zlib):
    signature, IHDR, one zlib-compressed IDAT (filter-0 scanlines of
    flat ``gray`` pixels, or the ``png_pixel`` pattern), IEND."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    if pattern:
        raw = b"".join(
            b"\x00" + bytes(png_pixel(x, y) for x in range(width))
            for y in range(height)
        )
    else:
        raw = b"".join(
            b"\x00" + bytes([gray]) * width for _ in range(height)
        )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# channel counts per PNG color type (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png_pixels(data: bytes) -> dict:
    """FULL pixel decode of an 8-bit PNG (gray / RGB / gray+alpha /
    RGBA, non-interlaced) — stdlib zlib + the five standard scanline
    unfilters (None/Sub/Up/Average/Paeth, RFC 2083 §6). PNG is a
    compressed format that needs NO media library, so the decode seam
    genuinely closes here. Returns the same integer stats dict as
    ``decode_bmp_pixels``: per-channel sum/min/max for the first three
    channels (missing channels None), plus the pixel count."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        ln = struct.unpack(">I", data[pos : pos + 4])[0]
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace:
        raise ValueError(
            "only 8-bit non-interlaced gray/RGB/LA/RGBA PNGs supported"
        )
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    prev = bytearray(stride)
    out = []
    p = 0
    for _y in range(height):
        ftype = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        prev = line
        out.append(bytes(line))
    # stats over the first min(ch, 3) color channels (alpha excluded
    # for LA/RGBA would complicate the contract; LA's channel 1 IS its
    # alpha — callers of gray+alpha get (gray, alpha) as ch0/ch1).
    # Channel→key mapping honors the FORMAT's storage order so the
    # shared PIXEL_STATS contract means the same color everywhere: PNG
    # truecolor stores R,G,B (ch0→r), unlike BMP's B,G,R (ch0→b);
    # grayscale/LA keep the ch0→b positional convention (gray in 'b').
    n_px = width * height
    stats: dict = {"n_units": n_px}
    names = ("r", "g", "b") if color_type in (2, 6) else ("b", "g", "r")
    for ci, name in enumerate(names):
        if ci < ch:
            vals = [row[i] for row in out for i in range(ci, stride, ch)]
            stats[f"sum_{name}"] = sum(vals)
            stats[f"min_{name}"] = min(vals)
            stats[f"max_{name}"] = max(vals)
        else:
            stats[f"sum_{name}"] = None
            stats[f"min_{name}"] = None
            stats[f"max_{name}"] = None
    return stats


def make_wav(n_frames: int, framerate: int = 8000, amplitude: int = 64) -> bytes:
    """Minimal valid 8-bit mono WAV via the stdlib ``wave`` writer."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(framerate)
        w.writeframes(bytes((128 + (i * amplitude) % 64) for i in range(n_frames)))
    return buf.getvalue()


JPEG_SOI = b"\xff\xd8"
# SOF0-SOF15 minus the non-frame C4 (DHT), C8 (JPG extension), CC (DAC)
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def make_jpeg(width: int, height: int, progressive: bool = False) -> bytes:
    """Minimal structurally-valid JPEG from pure stdlib struct packing:
    SOI, JFIF APP0, one quant table, SOF0 (baseline) or SOF2
    (progressive) carrying the dimensions, one huffman table, SOS with a
    token entropy segment, EOI. Header-parseable by any segment scanner;
    pixel content is not meaningful (matching the header-level decode
    scope of this module)."""

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes([16] * 64))
    sof_marker = 0xC2 if progressive else 0xC0
    sof = seg(
        sof_marker,
        struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00",
    )
    # one DC huffman table: a single 1-bit code mapping to value 0
    dht = seg(0xC4, b"\x00" + b"\x01" + b"\x00" * 15 + b"\x00")
    sos = seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    return JPEG_SOI + app0 + dqt + sof + dht + sos + b"\x00" + b"\xff\xd9"


# --- JPEG baseline sequential codec (r07, stdlib-only) -------------------
#
# Zigzag scan order: entry k is the NATURAL (row*8+col) index of the
# k-th zigzag coefficient (ITU-T T.81 figure 5 / libjpeg
# jpeg_natural_order).
JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K "typical" huffman tables (T.81 K.3.3): (BITS counts for code
# lengths 1..16, HUFFVAL). The encoder ships these; the decoder builds
# whatever the file's DHT carries.
_JPEG_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
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
    ],
)


def _jpeg_canonical_codes(bits: list[int], vals: list[int]):
    """(value -> (code, length)) canonical huffman assignment per T.81
    C.2: codes of each length are consecutive, starting from twice the
    previous length's end."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_decode_table(bits: list[int], vals: list[int]):
    """((length, code) -> value) — the decoder-side view of the same
    canonical assignment."""
    return {
        (length, code): v
        for v, (code, length) in _jpeg_canonical_codes(bits, vals).items()
    }


_JPEG_IDCT_COS = [
    [
        (0.3535533905932738 if u == 0 else 0.5)
        * math.cos((2 * x + 1) * u * math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]


def _jpeg_idct_block(coef: list[int]) -> list[list[int]]:
    """8x8 inverse DCT (T.81 A.3.3) + level shift + clamp: natural-order
    integer coefficients -> 8x8 spatial samples 0..255. Separable form:
    rows then columns through the precomputed basis."""
    tmp = [[0.0] * 8 for _ in range(8)]
    for r in range(8):
        row = coef[r * 8 : r * 8 + 8]
        for x in range(8):
            tmp[r][x] = sum(
                _JPEG_IDCT_COS[u][x] * row[u] for u in range(8)
            )
    out = [[0] * 8 for _ in range(8)]
    for x in range(8):
        for y in range(8):
            v = sum(_JPEG_IDCT_COS[u][y] * tmp[u][x] for u in range(8))
            out[y][x] = min(255, max(0, int(round(v + 128))))
    return out


def _jpeg_fdct_block(samples: list[list[int]]) -> list[int]:
    """8x8 forward DCT (T.81 A.3.1) on level-shifted samples, rounded to
    integer coefficients in natural order (quant table all ones)."""
    shifted = [[s - 128 for s in row] for row in samples]
    coef = [0] * 64
    for u in range(8):
        for v in range(8):
            acc = 0.0
            for y in range(8):
                cv = _JPEG_IDCT_COS[u][y]
                row = shifted[y]
                for x in range(8):
                    acc += row[x] * _JPEG_IDCT_COS[v][x] * cv
            coef[u * 8 + v] = int(round(acc))
    return coef


class _JpegBitWriter:
    """MSB-first bit packing with 0xFF 0x00 byte stuffing (T.81 B.1.1.5)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            b = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # 1-bit padding per spec
        return bytes(self.out)


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC coefficient — the
    variable-length integer encoding of T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def jpeg_pixel(x: int, y: int) -> int:
    """Deterministic BLOCK-CONSTANT grayscale value of synthetic pixel
    (x, y): constant inside each aligned 8x8 block, so the DCT of every
    block is DC-only and the (quant=1) round trip is bit-exact — the
    generative formula the DuckDB oracle recomputes analytically, the
    lossless corner of a lossy codec."""
    return ((x // 8) * 13 + (y // 8) * 29 + 7) % 256


def make_jpeg_baseline(
    width: int, height: int, pixel_fn=None, restart_interval: int = 0
) -> bytes:
    """REAL baseline sequential grayscale JPEG encoder, stdlib-only:
    level shift -> 8x8 FDCT -> quant (all-ones table) -> zigzag ->
    canonical huffman entropy coding with byte stuffing, wrapped in
    SOI/APP0/DQT/SOF0/DHT/SOS/EOI (plus DRI + RSTn markers when
    ``restart_interval`` is set). Edge blocks pad by edge replication.
    With the block-constant ``jpeg_pixel`` pattern the file decodes
    back bit-exactly (DC-only blocks, integer DC)."""
    pixel_fn = pixel_fn or jpeg_pixel
    dc_codes = _jpeg_canonical_codes(*_JPEG_STD_DC_LUMA)
    ac_codes = _jpeg_canonical_codes(*_JPEG_STD_AC_LUMA)
    w = _JpegBitWriter()
    pred = 0
    segments = [bytearray()]  # entropy bytes between restart markers
    mcu_count = 0
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                segments[-1] += w.flush()
                segments.append(bytearray())
                w = _JpegBitWriter()
                pred = 0
            mcu_count += 1
            block = [
                [
                    pixel_fn(min(bx + x, width - 1), min(by + y, height - 1))
                    for x in range(8)
                ]
                for y in range(8)
            ]
            coef = _jpeg_fdct_block(block)
            zz = [coef[JPEG_ZIGZAG[k]] for k in range(64)]
            cat, bits = _jpeg_magnitude(zz[0] - pred)
            pred = zz[0]
            c, ln = dc_codes[cat]
            w.put(c, ln)
            if cat:
                w.put(bits, cat)
            run = 0
            for k in range(1, 64):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]  # ZRL
                    w.put(c, ln)
                    run -= 16
                cat, bits = _jpeg_magnitude(zz[k])
                c, ln = ac_codes[(run << 4) | cat]
                w.put(c, ln)
                w.put(bits, cat)
                run = 0
            if run:
                c, ln = ac_codes[0x00]  # EOB
                w.put(c, ln)
    segments[-1] += w.flush()
    entropy = bytearray(segments[0])
    for si, later in enumerate(segments[1:]):
        entropy += bytes([0xFF, 0xD0 + (si % 8)]) + later
    entropy = bytes(entropy)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    app0 = seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    dqt = seg(0xDB, b"\x00" + bytes([1] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")
    dc_bits, dc_vals = _JPEG_STD_DC_LUMA
    ac_bits, ac_vals = _JPEG_STD_AC_LUMA
    dht = seg(
        0xC4,
        b"\x00" + bytes(dc_bits) + bytes(dc_vals)
        + b"\x10" + bytes(ac_bits) + bytes(ac_vals),
    )
    sos = seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    return (
        JPEG_SOI + app0 + dri + dqt + sof + dht + sos + entropy + b"\xff\xd9"
    )


def make_jpeg_progressive(
    width: int, height: int, pixel_fn=None
) -> bytes:
    """REAL progressive grayscale JPEG encoder (SOF2), stdlib-only,
    exercising all four progressive scan types of T.81 Annex G the way
    libjpeg's jcphuff.c does: DC first with successive approximation
    (Al=1), DC refinement (one raw bit per block), AC first over the
    1..31 band at Al=1 with EOB-run coding, AC refinement of that band
    (newly-significant coefficients + buffered correction bits), and a
    final AC first scan over the 32..63 band. Coefficients are computed
    once (same FDCT + all-ones quant as ``make_jpeg_baseline``), so the
    entropy layers are lossless re-encodings: progressive and baseline
    files of the same pixels decode to IDENTICAL pixels, which is what
    the parity test asserts."""
    pixel_fn = pixel_fn or jpeg_pixel
    dc_codes = _jpeg_canonical_codes(*_JPEG_STD_DC_LUMA)
    ac_codes = _jpeg_canonical_codes(*_JPEG_STD_AC_LUMA)
    blocks = []
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            block = [
                [
                    pixel_fn(min(bx + x, width - 1), min(by + y, height - 1))
                    for x in range(8)
                ]
                for y in range(8)
            ]
            coef = _jpeg_fdct_block(block)
            blocks.append([coef[JPEG_ZIGZAG[k]] for k in range(64)])

    def dc_first_scan(al: int) -> bytes:
        w = _JpegBitWriter()
        pred = 0
        for zz in blocks:
            v = zz[0] >> al  # arithmetic shift per T.81 point transform
            cat, bits = _jpeg_magnitude(v - pred)
            pred = v
            c, ln = dc_codes[cat]
            w.put(c, ln)
            if cat:
                w.put(bits, cat)
        return w.flush()

    def dc_refine_scan(al: int) -> bytes:
        w = _JpegBitWriter()
        for zz in blocks:
            w.put((zz[0] >> al) & 1, 1)
        return w.flush()

    def ac_first_scan(ss: int, se: int, al: int) -> bytes:
        # Annex K's AC table carries no EOBn (run>0) codes — those need
        # custom tables (why libjpeg always builds optimal tables for
        # progressive) — so this encoder ends every early block with a
        # plain EOB1 (0x00). The DECODER handles general EOB runs; the
        # handcrafted-stream test exercises EOBn > 1.
        w = _JpegBitWriter()
        for zz in blocks:
            run = 0
            wrote = False
            for k in range(ss, se + 1):
                v = zz[k]
                sign = v < 0
                t = (-v if sign else v) >> al  # magnitude point transform
                if t == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]
                    w.put(c, ln)
                    run -= 16
                cat, bits = _jpeg_magnitude(-t if sign else t)
                c, ln = ac_codes[(run << 4) | cat]
                w.put(c, ln)
                w.put(bits, cat)
                run = 0
                wrote = True
            if run or not wrote:
                c, ln = ac_codes[0x00]  # EOB1
                w.put(c, ln)
        return w.flush()

    def ac_refine_scan(ss: int, se: int, ah: int, al: int) -> bytes:
        # per-block EOB1 for the same Annex-K reason as ac_first_scan;
        # correction bits for coefficients after the last newly-
        # significant one ride behind that EOB (T.81 G.1.2.3 ordering)
        w = _JpegBitWriter()
        for zz in blocks:
            absval = [0] * (se + 1)
            eob_k = ss - 1  # last newly-significant index in this block
            for k in range(ss, se + 1):
                t = zz[k]
                t = (-t if t < 0 else t) >> al
                absval[k] = t
                if t == 1:
                    eob_k = k
            run = 0
            br: list[int] = []  # pending correction bits
            for k in range(ss, se + 1):
                t = absval[k]
                if t == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob_k:
                    c, ln = ac_codes[0xF0]
                    w.put(c, ln)
                    run -= 16
                    for b in br:
                        w.put(b, 1)
                    br = []
                if t > 1:
                    # already significant at Ah: append its correction bit
                    br.append(t & 1)
                    continue
                # newly significant: run/1 code + sign bit + pending bits
                c, ln = ac_codes[(run << 4) | 1]
                w.put(c, ln)
                w.put(0 if zz[k] < 0 else 1, 1)
                for b in br:
                    w.put(b, 1)
                br = []
                run = 0
            if run or br:
                c, ln = ac_codes[0x00]  # EOB1 + trailing correction bits
                w.put(c, ln)
                for b in br:
                    w.put(b, 1)
        return w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos(ss: int, se: int, ah: int, al: int) -> bytes:
        return seg(
            0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
        )

    app0 = seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    dqt = seg(0xDB, b"\x00" + bytes([1] * 64))
    sof = seg(0xC2, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")
    dc_bits, dc_vals = _JPEG_STD_DC_LUMA
    ac_bits, ac_vals = _JPEG_STD_AC_LUMA
    dht = seg(
        0xC4,
        b"\x00" + bytes(dc_bits) + bytes(dc_vals)
        + b"\x10" + bytes(ac_bits) + bytes(ac_vals),
    )
    return (
        JPEG_SOI + app0 + dqt + sof + dht
        + sos(0, 0, 0, 1) + dc_first_scan(1)
        + sos(0, 0, 1, 0) + dc_refine_scan(0)
        + sos(1, 31, 0, 1) + ac_first_scan(1, 31, 1)
        + sos(1, 31, 1, 0) + ac_refine_scan(1, 31, 1, 0)
        + sos(32, 63, 0, 0) + ac_first_scan(32, 63, 0)
        + b"\xff\xd9"
    )


class _JpegBitReader:
    """MSB-first entropy-segment bit reader honoring 0xFF00 byte
    stuffing; stops (returns None) at any real marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.i = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> bool:
        b = self.d[self.i]
        if b == 0xFF:
            if self.d[self.i + 1] == 0x00:
                self.i += 2
            else:
                return False  # marker
        else:
            self.i += 1
        self._acc = (self._acc << 8) | b
        self._n += 8
        return True

    def read_bit(self) -> int:
        if self._n == 0 and not self._fill():
            raise ValueError("hit marker inside entropy segment")
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Byte-align and consume an RSTn marker (T.81 B.2.1.2)."""
        self._acc = 0
        self._n = 0
        if not (self.d[self.i] == 0xFF and 0xD0 <= self.d[self.i + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.i += 2


def _jpeg_extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _jpeg_read_code(bits: _JpegBitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.read_bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid huffman code")


def decode_jpeg_pixels(data: bytes) -> dict:
    """FULL pixel decode of a BASELINE SEQUENTIAL JPEG (SOF0: huffman
    entropy decode with byte stuffing + restart markers, dequantize,
    zigzag reorder, 8x8 IDCT, sampling-factor upsampling, and JFIF
    YCbCr->RGB for 3-component scans) — stdlib-only, ~math+struct. The
    third genuinely COMPRESSED format this module decodes end to end
    (after PNG's inflate+unfilter and GIF's LZW). Returns the shared
    PIXEL_STATS dict: grayscale stats ride the positional *_b keys
    (like gray PNG/WAV); 3-component scans map R->r, G->g, B->b.
    Huffman PROGRESSIVE (SOF2) decodes too since r07: scans accumulate
    into a per-component coefficient store (DC first/refine, AC first
    with EOB runs, AC refine with correction bits — T.81 Annex G /
    libjpeg jdphuff.c) and reconstruct at EOI. Arithmetic coding,
    hierarchical modes and 12-bit precision raise NotImplementedError
    — the remaining documented seam."""
    if data[:2] != JPEG_SOI:
        raise ValueError("not a JPEG")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    restart_interval = 0
    frame = None
    prog_coefs = None  # progressive: per-component coefficient store
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[i + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
        body = data[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq == 0:
                    qt[tq] = list(body[p : p + 64])
                    p += 64
                else:
                    qt[tq] = [
                        struct.unpack(">H", body[p + 2 * k : p + 2 * k + 2])[0]
                        for k in range(64)
                    ]
                    p += 128
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits_counts = list(body[p + 1 : p + 17])
                nvals = sum(bits_counts)
                vals = list(body[p + 17 : p + 17 + nvals])
                huff[(tc, th)] = _jpeg_decode_table(bits_counts, vals)
                p += 17 + nvals
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker in _JPEG_SOF_MARKERS:
            if marker not in (0xC0, 0xC1, 0xC2):
                raise NotImplementedError(
                    "only baseline sequential (SOF0/SOF1) and huffman"
                    f" progressive (SOF2) JPEG decode; SOF{marker - 0xC0}"
                    " (hierarchical/arithmetic) is the remaining seam"
                )
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", body[:6]
            )
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {
                "w": width, "h": height, "comps": comps,
                "prog": marker == 0xC2,
            }
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for s in range(ns):
                cs, tdta = body[1 + 2 * s : 3 + 2 * s]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append(
                    {"comp": comp, "dc": tdta >> 4, "ac": tdta & 0x0F}
                )
            if frame["prog"]:
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                if (ss == 0) != (se == 0) or se > 63 or ss > se:
                    raise ValueError(
                        "invalid progressive spectral band: DC scans are"
                        " Ss=Se=0, AC bands live in 1..63 (T.81 G.1.1.1.1)"
                    )
                if ss > 0 and ns != 1:
                    raise ValueError(
                        "progressive AC scans must be single-component"
                    )
                if prog_coefs is None:
                    # allocate at the interleaved grid (>= the
                    # non-interleaved grid) so both scan shapes fit
                    hmax = max(c["h"] for c in frame["comps"])
                    vmax = max(c["v"] for c in frame["comps"])
                    mcux = -(-frame["w"] // (8 * hmax))
                    mcuy = -(-frame["h"] // (8 * vmax))
                    prog_coefs = {
                        c["id"]: [
                            [[0] * 64 for _ in range(mcux * c["h"])]
                            for _ in range(mcuy * c["v"])
                        ]
                        for c in frame["comps"]
                    }
                i = _jpeg_decode_prog_scan(
                    data, i + 2 + seglen, frame, scan, ss, se,
                    ahal >> 4, ahal & 0x0F, prog_coefs, huff,
                    restart_interval,
                )
                continue
            i = i + 2 + seglen
            planes = _jpeg_decode_scan(
                data, i, frame, scan, qt, huff, restart_interval
            )
            return _jpeg_planes_to_stats(frame, planes)
        i += 2 + seglen
    if frame is not None and frame.get("prog") and prog_coefs is not None:
        planes = _jpeg_prog_reconstruct(frame, prog_coefs, qt)
        return _jpeg_planes_to_stats(frame, planes)
    raise ValueError("no SOS marker found")


def _jpeg_comp_block_grid(frame, c) -> tuple[int, int]:
    """(blocks_wide, blocks_tall) of one component's NON-interleaved
    grid (T.81 A.2.2: ceil of the scaled dimensions over 8)."""
    hmax = max(cc["h"] for cc in frame["comps"])
    vmax = max(cc["v"] for cc in frame["comps"])
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-cw // 8), -(-ch // 8)


def _jpeg_decode_prog_scan(
    data: bytes, pos: int, frame, scan, ss, se, ah, al, coefs, huff,
    restart_interval,
) -> int:
    """Decode ONE progressive scan (T.81 Annex G / libjpeg jdphuff.c)
    into the persistent per-component coefficient store, covering all
    four scan types: DC first (diff huffman, point transform Al), DC
    refinement (one raw bit per block), AC first (EOB-run coding), AC
    refinement (newly-significant insertions + correction bits).
    Returns the byte offset of the next marker."""
    bits = _JpegBitReader(data, pos)
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    eobrun = 0
    preds = {sc["comp"]["id"]: 0 for sc in scan}
    p1, m1 = 1 << al, -(1 << al)

    def dc_first(sc, blk):
        cat = _jpeg_read_code(bits, huff[(0, sc["dc"])])
        diff = _jpeg_extend(bits.receive(cat), cat)
        preds[sc["comp"]["id"]] += diff
        blk[0] = preds[sc["comp"]["id"]] << al

    def dc_refine(blk):
        if bits.read_bit():
            blk[0] |= p1

    def ac_first(sc, blk):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _jpeg_read_code(bits, huff[(1, sc["ac"])])
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += bits.receive(r)
                break
            k += r
            if k > se:  # ZRL/run past the band end on a corrupt stream
                raise ValueError(
                    "corrupt progressive scan: coefficient run past band end"
                )
            blk[k] = _jpeg_extend(bits.receive(s), s) << al
            k += 1

    def ac_refine(sc, blk):
        # mirrors libjpeg decode_mcu_AC_refine: history-aware run
        # advance reading one correction bit at every already-nonzero
        # coefficient passed over
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _jpeg_read_code(bits, huff[(1, sc["ac"])])
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s:
                    newval = p1 if bits.read_bit() else m1
                elif r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += bits.receive(r)
                    break
                while k <= se:
                    if blk[k] != 0:
                        if bits.read_bit() and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                    else:
                        r -= 1
                        if r < 0:
                            break
                    k += 1
                if newval:
                    if k > se:  # corrupt stream: insertion past band end
                        raise ValueError(
                            "corrupt progressive scan: insertion past band end"
                        )
                    blk[k] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                if blk[k] != 0 and bits.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
                k += 1
            eobrun -= 1

    def decode_block(sc, blk):
        if ss == 0:
            if ah == 0:
                dc_first(sc, blk)
            else:
                dc_refine(blk)
        else:
            if ah == 0:
                ac_first(sc, blk)
            else:
                ac_refine(sc, blk)

    unit_count = 0

    def maybe_restart():
        nonlocal eobrun, preds
        if restart_interval and unit_count and (
            unit_count % restart_interval == 0
        ):
            bits.align_restart()
            eobrun = 0
            preds = {k: 0 for k in preds}

    if len(scan) > 1:
        # interleaved (DC scans only, per T.81 G.1.1.1): MCU order
        mcux = -(-frame["w"] // (8 * hmax))
        mcuy = -(-frame["h"] // (8 * vmax))
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                unit_count += 1
                for sc in scan:
                    c = sc["comp"]
                    for bv in range(c["v"]):
                        for bh_ in range(c["h"]):
                            decode_block(
                                sc,
                                coefs[c["id"]][my * c["v"] + bv]
                                [mx * c["h"] + bh_],
                            )
    else:
        sc = scan[0]
        c = sc["comp"]
        bw, bh = _jpeg_comp_block_grid(frame, c)
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                unit_count += 1
                decode_block(sc, coefs[c["id"]][by][bx])

    # skip byte-align padding, return the next real marker's offset
    j = bits.i
    while j + 1 < len(data) and not (
        data[j] == 0xFF and data[j + 1] != 0x00
    ):
        j += 1
    return j


def _jpeg_prog_reconstruct(frame, coefs, qt):
    """Dequantize + IDCT the accumulated progressive coefficient store
    into per-component sample planes (same output shape as the baseline
    scan decoder)."""
    planes = {}
    for c in frame["comps"]:
        bw, bh = _jpeg_comp_block_grid(frame, c)
        quant = qt[c["tq"]]
        plane = [[0] * (bw * 8) for _ in range(bh * 8)]
        for by in range(bh):
            for bx in range(bw):
                zz = coefs[c["id"]][by][bx]
                coef = [0] * 64
                for k in range(64):
                    coef[JPEG_ZIGZAG[k]] = zz[k] * quant[k]
                block = _jpeg_idct_block(coef)
                for y in range(8):
                    row = plane[by * 8 + y]
                    brow = block[y]
                    for x in range(8):
                        row[bx * 8 + x] = brow[x]
        planes[c["id"]] = plane
    return planes


def _jpeg_decode_scan(
    data: bytes, pos: int, frame, scan, qt, huff, restart_interval
):
    """Entropy-decode every MCU of a (single, interleaved) baseline scan
    into per-component sample planes."""
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for sc in scan:
        c = sc["comp"]
        planes[c["id"]] = [
            [0] * (mcux * c["h"] * 8) for _ in range(mcuy * c["v"] * 8)
        ]
    bits = _JpegBitReader(data, pos)
    preds = {sc["comp"]["id"]: 0 for sc in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                bits.align_restart()
                preds = {k: 0 for k in preds}
            mcu_count += 1
            for sc in scan:
                c = sc["comp"]
                quant = qt[c["tq"]]
                for bv in range(c["v"]):
                    for bh in range(c["h"]):
                        zz = [0] * 64
                        cat = _jpeg_read_code(bits, huff[(0, sc["dc"])])
                        diff = _jpeg_extend(bits.receive(cat), cat)
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _jpeg_read_code(bits, huff[(1, sc["ac"])])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            zz[k] = _jpeg_extend(bits.receive(s), s)
                            k += 1
                        coef = [0] * 64
                        for k2 in range(64):
                            coef[JPEG_ZIGZAG[k2]] = zz[k2] * quant[k2]
                        block = _jpeg_idct_block(coef)
                        oy = (my * c["v"] + bv) * 8
                        ox = (mx * c["h"] + bh) * 8
                        plane = planes[c["id"]]
                        for y in range(8):
                            row = plane[oy + y]
                            brow = block[y]
                            for x in range(8):
                                row[ox + x] = brow[x]
    return planes


def _jpeg_planes_to_stats(frame, planes) -> dict:
    """Upsample component planes to image resolution, convert to the
    output color space, and reduce to the shared PIXEL_STATS dict."""
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)

    def sample(c, x, y):
        return planes[c["id"]][(y * c["v"]) // vmax][(x * c["h"]) // hmax]

    n_px = w * h
    if len(comps) == 1:
        c0 = comps[0]
        vals = [sample(c0, x, y) for y in range(h) for x in range(w)]
        return {
            "n_units": n_px,
            "sum_b": sum(vals), "min_b": min(vals), "max_b": max(vals),
            "sum_g": None, "min_g": None, "max_g": None,
            "sum_r": None, "min_r": None, "max_r": None,
        }
    if len(comps) != 3:
        raise NotImplementedError("only 1- or 3-component JPEGs supported")
    cy, cb, cr = comps
    sums = [0, 0, 0]
    mins = [255, 255, 255]
    maxs = [0, 0, 0]
    for y in range(h):
        for x in range(w):
            Y = sample(cy, x, y)
            Cb = sample(cb, x, y) - 128
            Cr = sample(cr, x, y) - 128
            rgb = (
                Y + 1.402 * Cr,
                Y - 0.344136 * Cb - 0.714136 * Cr,
                Y + 1.772 * Cb,
            )
            for ci, v in enumerate(rgb):
                iv = min(255, max(0, int(round(v))))
                sums[ci] += iv
                mins[ci] = min(mins[ci], iv)
                maxs[ci] = max(maxs[ci], iv)
    return {
        "n_units": n_px,
        "sum_r": sums[0], "min_r": mins[0], "max_r": maxs[0],
        "sum_g": sums[1], "min_g": mins[1], "max_g": maxs[1],
        "sum_b": sums[2], "min_b": mins[2], "max_b": maxs[2],
    }


def parse_jpeg_header(data: bytes) -> tuple[int, int]:
    """(width, height) from the first SOFn frame header, found by the
    standard JPEG segment walk (skip each marker segment by its declared
    length until a start-of-frame marker). Handles fill bytes (padding
    0xFF runs) and standalone markers (RST, TEM)."""
    if data[:2] != JPEG_SOI:
        raise ValueError("not a JPEG")
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        j = i + 1
        while j < n and data[j] == 0xFF:  # fill bytes
            j += 1
        if j >= n:
            break
        marker = data[j]
        if marker in _JPEG_SOF_MARKERS:
            # segment: len(2) precision(1) height(2) width(2) ...
            height, width = struct.unpack(">HH", data[j + 4 : j + 8])
            return int(width), int(height)
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            # standalone markers (TEM, RSTn, EOI before any SOF)
            if marker == 0xD9:
                break
            i = j + 1
            continue
        if marker == 0xDA:
            break  # entropy-coded data begins; no SOF seen
        seglen = struct.unpack(">H", data[j + 1 : j + 3])[0]
        i = j + 1 + seglen
    raise ValueError("no SOF marker found")


def gif_pixel(x: int, y: int) -> int:
    """Deterministic palette index (== grayscale value under the
    identity palette) of synthetic GIF pixel (x, y) — the generative
    formula the DuckDB oracle recomputes analytically."""
    return (x * 5 + y * 11) % 256


def _lzw_encode(indices: bytes, mcs: int = 8) -> bytes:
    """GIF-variant LZW compression of a palette-index stream: variable
    code width starting at ``mcs``+1 bits, LSB-first bit packing,
    CLEAR/EOI control codes, width growth when the next free code
    reaches 2^width, dictionary reset at 4096 (GIF89a spec, app. F)."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    width = mcs + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    prefix = b""
    for c in indices:
        nxt = prefix + bytes([c])
        if nxt in table:
            prefix = nxt
            continue
        emit(table[prefix], width)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            # one add LATER than the decoder's (1 << width) rule: the
            # decoder's table lags the encoder's by exactly one entry
            # (it adds only after its second post-clear read), so the
            # encoder must delay the width bump one step to stay in
            # lockstep — the classic GIF LZW off-by-one
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        prefix = bytes([c])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int) -> bytes:
    """Inverse of ``_lzw_encode`` — the real GIF LZW decoder, including
    the KwKwK self-referential case (code == next free code) and the
    mirrored width-growth rule, so encoder and decoder stay in lockstep
    bit for bit."""
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    table = {i: bytes([i]) for i in range(clear)}
    next_code = eoi + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + width <= total_bits:
        code = 0
        for k in range(width):
            p = bitpos + k
            code |= ((data[p >> 3] >> (p & 7)) & 1) << k
        bitpos += width
        if code == clear:
            table = {i: bytes([i]) for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
        elif code == next_code:
            entry = prev + prev[:1]
            if next_code < 4096:
                table[next_code] = entry
                next_code += 1
        else:
            raise ValueError(f"bad LZW code {code}")
        if next_code == (1 << width) and width < 12:
            width += 1
        out += entry
        prev = entry
    return bytes(out)


def make_gif(width: int, height: int, pixels: bool = False) -> bytes:
    """GIF89a from pure stdlib. ``pixels=False``: header + logical
    screen descriptor + trailer (header-parser fixture, no image data).
    ``pixels=True``: a COMPLETE single-frame GIF — 256-entry grayscale
    global color table (identity palette: index i → (i, i, i)), image
    descriptor, and a genuinely LZW-COMPRESSED index stream of the
    ``gif_pixel`` pattern in 255-byte sub-blocks."""
    lsd_flags = 0xF7 if pixels else 0x00  # GCT present, 8-bit, size 256
    head = (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + bytes([lsd_flags, 0, 0])  # flags, bg color, aspect
    )
    if not pixels:
        return head + b"\x3b"
    gct = bytes(v for i in range(256) for v in (i, i, i))
    descriptor = b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    idx = bytes(
        gif_pixel(x, y) for y in range(height) for x in range(width)
    )
    lzw = _lzw_encode(idx, mcs=8)
    blocks = b"".join(
        bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    return head + gct + descriptor + b"\x08" + blocks + b"\x00" + b"\x3b"


def decode_gif_pixels(data: bytes) -> dict:
    """FULL pixel decode of a non-interlaced GIF87a/89a frame — header,
    global color table, block walk (extensions skipped by sub-block
    structure), LZW decompression of the concatenated image sub-blocks,
    palette mapping. Returns single-channel integer statistics in the
    same shape as the other mono decoders."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", data[6:10])
    flags = data[10]
    i = 13
    palette = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        palette = data[i : i + 3 * size]
        i += 3 * size
    while i < len(data):
        b = data[i]
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while data[i] != 0:
                i += 1 + data[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            iw, ih = struct.unpack("<HH", data[i + 5 : i + 9])
            iflags = data[i + 9]
            i += 10
            if iflags & 0x80:  # local color table wins
                size = 2 << (iflags & 0x07)
                palette = data[i : i + 3 * size]
                i += 3 * size
            mcs = data[i]
            i += 1
            lzw = bytearray()
            while data[i] != 0:
                n = data[i]
                lzw += data[i + 1 : i + 1 + n]
                i += 1 + n
            idx = _lzw_decode(bytes(lzw), mcs)
            if len(idx) != iw * ih:
                raise ValueError(
                    f"decoded {len(idx)} indices for {iw}x{ih} frame"
                )
            if palette is None:
                raise ValueError("no color table")
            # Single-channel stats in the first (*_b) slot, same
            # positional convention as grayscale PNG/WAV: the tracked
            # channel is the palette's RED byte (paletted formats have
            # no per-pixel channel order; the choice is documented, not
            # a color claim)
            vals = [palette[3 * j] for j in idx]
            return {
                "n_units": iw * ih,
                "sum_b": sum(vals),
                "min_b": min(vals),
                "max_b": max(vals),
                "sum_g": None, "min_g": None, "max_g": None,
                "sum_r": None, "min_r": None, "max_r": None,
            }
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("no image descriptor found")


def parse_gif_header(data: bytes) -> tuple[int, int]:
    """(width, height) from the logical screen descriptor (little-endian
    at fixed offset 6, per the GIF87a/89a spec)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", data[6:10])
    return int(w), int(h)


def bmp_pixel(x: int, y: int) -> tuple[int, int, int]:
    """The deterministic (b, g, r) value of synthetic pixel (x, y) —
    the generative formula the DuckDB oracle recomputes analytically,
    so full pixel decode is value-checkable without a reference image
    library."""
    return ((x * 7 + y * 13) % 256, (x * 11 + y * 3) % 256, (x * 5 + y * 17) % 256)


def make_bmp(width: int, height: int, pixels: bool = False) -> bytes:
    """Minimal BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, optionally with
    a real uncompressed 24bpp BI_RGB pixel array (bottom-up rows, 4-byte
    row padding per the DIB spec; values from ``bmp_pixel``)."""
    row_size = (width * 3 + 3) & ~3
    data = b""
    if pixels:
        rows = []
        for y in range(height - 1, -1, -1):  # bottom-up storage order
            row = bytearray()
            for x in range(width):
                row += bytes(bmp_pixel(x, y))
            row += b"\x00" * (row_size - len(row))
            rows.append(bytes(row))
        data = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 0, 0, 0, 0
    )
    file_header = struct.pack(
        "<2sIHHI", b"BM", 14 + len(info) + len(data), 0, 0, 14 + len(info)
    )
    return file_header + info + data


def decode_bmp_pixels(data: bytes) -> dict:
    """FULL pixel decode of an uncompressed 24bpp BI_RGB BMP — stdlib
    struct only, no PIL. Returns integer per-channel statistics
    (sum/min/max for b, g, r) plus the pixel count: integers are
    oracle-exact where float means would invite rounding drift.
    Raises ValueError for BMPs outside the 24bpp/BI_RGB envelope."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_off = struct.unpack("<I", data[10:14])[0]
    w, h = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    compression = struct.unpack("<I", data[30:34])[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24bpp BI_RGB supported")
    height = abs(int(h))
    top_down = h < 0
    width = int(w)
    row_size = (width * 3 + 3) & ~3
    sums = [0, 0, 0]
    mins = [255, 255, 255]
    maxs = [0, 0, 0]
    for r in range(height):
        base = pixel_off + r * row_size
        row = data[base : base + width * 3]
        if len(row) < width * 3:
            raise ValueError("truncated BMP pixel array")
        for c in range(3):
            ch = row[c::3]
            sums[c] += sum(ch)
            mins[c] = min(mins[c], min(ch))
            maxs[c] = max(maxs[c], max(ch))
    # (row order never affects the stats, so top-down vs bottom-up DIBs
    # decode identically here)
    del top_down
    n = width * height
    return {
        "n_units": n,
        "sum_b": sums[0], "min_b": mins[0], "max_b": maxs[0],
        "sum_g": sums[1], "min_g": mins[1], "max_g": maxs[1],
        "sum_r": sums[2], "min_r": mins[2], "max_r": maxs[2],
    }


def resize_bmp(data: bytes, target_w: int, target_h: int) -> bytes:
    """Nearest-neighbor resize of an uncompressed 24bpp BMP — a REAL
    resize with stdlib only (decode → resample → re-encode). Source
    pixel for target (tx, ty) is (tx*sw // tw, ty*sh // th), the
    standard floor-mapped nearest-neighbor kernel."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_off = struct.unpack("<I", data[10:14])[0]
    sw, sh_raw = struct.unpack("<ii", data[18:26])
    bpp = struct.unpack("<H", data[28:30])[0]
    compression = struct.unpack("<I", data[30:34])[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24bpp BI_RGB supported")
    sh = abs(int(sh_raw))
    src_row = (sw * 3 + 3) & ~3

    def src_px(x: int, y: int) -> bytes:
        # storage is bottom-up for positive heights
        r = (sh - 1 - y) if sh_raw > 0 else y
        base = pixel_off + r * src_row + x * 3
        return data[base : base + 3]

    dst_row_size = (target_w * 3 + 3) & ~3
    rows = []
    for ty in range(target_h - 1, -1, -1):  # write bottom-up
        row = bytearray()
        sy = ty * sh // target_h
        for tx in range(target_w):
            row += src_px(tx * sw // target_w, sy)
        row += b"\x00" * (dst_row_size - len(row))
        rows.append(bytes(row))
    pixels = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, target_w, target_h, 1, 24, 0, len(pixels),
        0, 0, 0, 0,
    )
    file_header = struct.pack(
        "<2sIHHI", b"BM", 14 + len(info) + len(pixels), 0, 0, 14 + len(info)
    )
    return file_header + info + pixels


def decode_wav_samples(data: bytes) -> dict:
    """FULL PCM sample decode of a WAV — stdlib ``wave`` + ``struct``.
    8-bit PCM decodes as unsigned [0, 255]; 16-bit as signed little-endian.
    Returns integer sample statistics (sum/min/max over all channels
    interleaved) plus the frame count."""
    with wave.open(io.BytesIO(data), "rb") as wv:
        n_frames = wv.getnframes()
        sampwidth = wv.getsampwidth()
        raw = wv.readframes(n_frames)
    if sampwidth == 1:
        samples = list(raw)
    elif sampwidth == 2:
        samples = list(struct.unpack(f"<{len(raw) // 2}h", raw))
    else:
        raise ValueError("only 8/16-bit PCM supported")
    if not samples:
        raise ValueError("empty WAV")
    return {
        "n_units": n_frames,
        "sum_b": sum(samples), "min_b": min(samples), "max_b": max(samples),
        "sum_g": None, "min_g": None, "max_g": None,
        "sum_r": None, "min_r": None, "max_r": None,
    }


def parse_bmp_header(data: bytes) -> tuple[int, int]:
    """(width, height) from BITMAPINFOHEADER (height may be negative for
    top-down DIBs — absolute value is the pixel height)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    w, h = struct.unpack("<ii", data[18:26])
    return int(w), abs(int(h))


def parse_png_header(data: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR chunk — the first chunk after the
    8-byte signature per the PNG spec, so a fixed-offset read."""
    if data[:8] != PNG_MAGIC or data[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    return struct.unpack(">II", data[16:24])


def parse_wav_header(data: bytes) -> tuple[int, int, int, int]:
    """(n_frames, framerate, n_channels, sampwidth) via stdlib wave."""
    with wave.open(io.BytesIO(data), "rb") as w:
        return (w.getnframes(), w.getframerate(), w.getnchannels(), w.getsampwidth())


def avi_pixel(x: int, y: int, f: int) -> tuple[int, int, int]:
    """Generative (b, g, r) for AVI frame ``f`` at ``(x, y)`` — the
    ``bmp_pixel`` linear-congruence family extended with a per-frame
    term so every frame differs and the oracle can recompute each
    frame's statistics analytically."""
    return (
        (x * 7 + y * 13 + f * 19) % 256,
        (x * 11 + y * 3 + f * 23) % 256,
        (x * 5 + y * 17 + f * 29) % 256,
    )


def mjpeg_pixel(x: int, y: int, f: int) -> int:
    """Generative grayscale value for Motion-JPEG frame ``f`` at
    ``(x, y)`` — block-constant per frame (the ``jpeg_pixel`` family
    with a per-frame term), so every frame's lossy JPEG round trip is
    bit-exact at quant=1 and the oracle recomputes it analytically."""
    return ((x // 8) * 13 + (y // 8) * 29 + 7 + f * 31) % 256


def make_avi(
    width: int, height: int, n_frames: int, pixels: bool = False,
    codec: str = "dib",
) -> bytes:
    """Minimal structurally-valid RIFF AVI: the ``hdrl`` LIST with a
    56-byte ``avih`` main header (dwTotalFrames / dwWidth / dwHeight at
    their spec offsets) plus a ``movi`` LIST — the container shape
    every AVI demuxer probes first. With ``pixels=True`` the movi LIST
    carries ``n_frames`` real frame chunks: ``codec="dib"`` writes
    uncompressed ``00db`` DIB frames (bottom-up BGR rows padded to 4
    bytes — the exact BMP pixel-array layout, per the Video-for-Windows
    convention; pixels from ``avi_pixel``), ``codec="mjpeg"`` writes
    COMPRESSED ``00dc`` frames, each a complete baseline JPEG of the
    ``mjpeg_pixel`` pattern — the Motion-JPEG layout real capture
    hardware emits."""
    avih = struct.pack(
        "<14I", 33333, 0, 0, 0, n_frames, 0, 1, 0, width, height, 0, 0, 0, 0
    )
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    lst = b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    movi_body = b"movi"
    if pixels:
        for f in range(n_frames):
            if codec == "mjpeg":
                frame = make_jpeg_baseline(
                    width, height,
                    pixel_fn=lambda x, y, _f=f: mjpeg_pixel(x, y, _f),
                )
                cid = b"00dc"
            else:
                row_pad = b"\x00" * ((-width * 3) % 4)
                rows = []
                for y in range(height - 1, -1, -1):  # bottom-up like BMP
                    row = bytearray()
                    for x in range(width):
                        row += bytes(avi_pixel(x, y, f))
                    rows.append(bytes(row) + row_pad)
                frame = b"".join(rows)
                cid = b"00db"
            chunk = cid + struct.pack("<I", len(frame)) + frame
            if len(frame) % 2:  # RIFF chunks are word-aligned
                chunk += b"\x00"
            movi_body += chunk
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = b"AVI " + lst + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_avi_frames(data: bytes):
    """Demux an AVI's video frames: yields ``(frame_idx, width, height,
    kind, body)`` for every ``00db`` (kind="dib": bottom-up BGR rows
    padded to 4 bytes) and ``00dc`` (kind="mjpeg": a complete JPEG)
    chunk in the ``movi`` LIST. Raises ValueError when the container is
    malformed or the avih frame count disagrees with the movi chunk
    count; codecs other than uncompressed DIB and Motion-JPEG surface
    through the count mismatch or the inner JPEG decoder — inter-frame
    codecs remain the documented seam."""
    width, height, n_frames = parse_avi_header(data)
    # Walk TOP-LEVEL RIFF chunks by (id, size) from offset 12 — a byte
    # search for b"LIST" can false-match inside non-LIST chunk payloads
    # (JUNK fill, strf codec data) and mis-locate movi (ADVICE r07).
    movi_start = movi_end = -1
    p = 12
    while p + 8 <= len(data):
        cid = data[p : p + 4]
        size = struct.unpack("<I", data[p + 4 : p + 8])[0]
        if cid == b"LIST" and data[p + 8 : p + 12] == b"movi":
            movi_start, movi_end = p + 12, p + 8 + size
            break
        p += 8 + size + (size % 2)
    if movi_start < 0:
        raise ValueError("AVI missing movi LIST")
    row_size = (width * 3 + 3) & ~3
    frame_size = row_size * height
    decoded = 0
    q = movi_start
    while q + 8 <= movi_end:
        cid = data[q : q + 4]
        csize = struct.unpack("<I", data[q + 4 : q + 8])[0]
        body = data[q + 8 : q + 8 + csize]
        q += 8 + csize + (csize % 2)
        if cid == b"00db":
            if len(body) < frame_size:
                raise ValueError("truncated AVI DIB frame")
            yield decoded, width, height, "dib", body
            decoded += 1
        elif cid == b"00dc":
            yield decoded, width, height, "mjpeg", body
            decoded += 1
    if decoded != n_frames:
        raise ValueError(
            f"avih promises {n_frames} frames, movi carries {decoded}"
        )


def _dib_channel_stats(body: bytes, width: int, height: int):
    """(sums, mins, maxs) per BGR channel over one DIB frame body."""
    row_size = (width * 3 + 3) & ~3
    sums = [0, 0, 0]
    mins = [255, 255, 255]
    maxs = [0, 0, 0]
    for r in range(height):
        row = body[r * row_size : r * row_size + width * 3]
        for c in range(3):
            ch = row[c::3]
            sums[c] += sum(ch)
            mins[c] = min(mins[c], min(ch))
            maxs[c] = max(maxs[c], max(ch))
    return sums, mins, maxs


def _avi_frame_channel_stats(width, height, kind, body):
    """(n_px, sums, mins, maxs) for one demuxed AVI frame — DIB rows
    directly, Motion-JPEG through the full JPEG decoder. Grayscale
    MJPEG rides the positional b channel with -1 g/r sentinels (the
    WAV/gray-PNG convention)."""
    if kind == "dib":
        sums, mins, maxs = _dib_channel_stats(body, width, height)
        return width * height, sums, mins, maxs
    st = decode_jpeg_pixels(bytes(body))
    sums = [st["sum_b"], st.get("sum_g", -1), st.get("sum_r", -1)]
    mins = [st["min_b"], st.get("min_g", -1), st.get("min_r", -1)]
    maxs = [st["max_b"], st.get("max_g", -1), st.get("max_r", -1)]
    sums = [-1 if v is None else v for v in sums]
    mins = [-1 if v is None else v for v in mins]
    maxs = [-1 if v is None else v for v in maxs]
    return st["n_units"], sums, mins, maxs


def decode_avi_frames(data: bytes) -> dict:
    """FULL frame decode of an AVI — stdlib only, no ffmpeg: walks the
    ``movi`` LIST and decodes every frame, ``00db`` uncompressed DIB
    rows directly and ``00dc`` Motion-JPEG frames through the complete
    JPEG decoder. Returns integer per-channel statistics over ALL
    frames' pixels in the ``decode_bmp_pixels`` shape (n_units summed
    over frames). Raises ValueError on malformed containers or mixed
    codecs; inter-frame video codecs remain the documented seam."""
    sums = [0, 0, 0]
    mins = [255, 255, 255]
    maxs = [0, 0, 0]
    n_px = 0
    kinds = set()
    for _idx, width, height, kind, body in _iter_avi_frames(data):
        kinds.add(kind)
        if len(kinds) > 1:
            raise ValueError("mixed-codec AVI not supported")
        fn, fs, fmin, fmax = _avi_frame_channel_stats(
            width, height, kind, body
        )
        gray = fs[1] < 0
        for c in range(1 if gray else 3):
            sums[c] += fs[c]
            mins[c] = min(mins[c], fmin[c])
            maxs[c] = max(maxs[c], fmax[c])
        if gray:
            sums[1] = sums[2] = -1
            mins[1] = mins[2] = -1
            maxs[1] = maxs[2] = -1
        n_px += fn
    return {
        "n_units": n_px,
        "sum_b": sums[0], "min_b": mins[0], "max_b": maxs[0],
        "sum_g": sums[1], "min_g": mins[1], "max_g": maxs[1],
        "sum_r": sums[2], "min_r": mins[2], "max_r": maxs[2],
    }


FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_px", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("min_b", T.LongType()),
        T.StructField("max_b", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("min_g", T.LongType()),
        T.StructField("max_g", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("min_r", T.LongType()),
        T.StructField("max_r", T.LongType()),
    ]
)


def synth_video_assets(spark: SparkSession, n: int = 40) -> DataFrame:
    """Deterministic multi-frame AVIs, up to 8 frames each, alternating
    codecs by asset parity: even ids are uncompressed-DIB (``avi_pixel``
    BGR pattern), odd ids are Motion-JPEG (each ``00dc`` frame a real
    baseline JPEG of the block-constant ``mjpeg_pixel`` pattern —
    genuinely COMPRESSED video). Distributed Arrow-batched generation,
    same shape as ``synth_pixel_assets``."""
    ensure_worker_imports(spark)

    def build(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                payload = make_avi(
                    4 + i % 9, 3 + i % 6, 2 + i % 7, pixels=True,
                    codec="mjpeg" if i % 2 else "dib",
                )
                rows.append(
                    {
                        "asset_id": i,
                        "modality": "video",
                        "payload": payload,
                        "meta": {
                            "mime": "video/x-msvideo",
                            "n_bytes": len(payload),
                            "source_uri": f"synthetic://video/{i}",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(build, schema=ASSET_SCHEMA)


def avi_frame_stats(assets: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL frame-sampling over video payloads: demux each AVI's movi
    LIST, decode every ``every_n``-th frame — uncompressed ``00db`` DIB
    rows directly, COMPRESSED ``00dc`` Motion-JPEG frames through the
    full JPEG decoder — one output row per (asset, sampled frame) with
    integer per-channel stats (grayscale MJPEG rides the positional b
    channel, -1 sentinels for g/r). The decoded-pixels upgrade of
    ``frame_sample``'s byte-offset plumbing. Arrow-batched
    ``mapInPandas``; per-asset work is O(payload) with no cross-row
    state."""
    ensure_worker_imports(assets.sparkSession)

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for idx, w, h, kind, body in _iter_avi_frames(
                    bytes(payload)
                ):
                    if idx % every_n:
                        continue
                    n_px, sums, mins, maxs = _avi_frame_channel_stats(
                        w, h, kind, body
                    )
                    rows.append(
                        {
                            "asset_id": int(aid),
                            "frame_idx": idx,
                            "n_px": n_px,
                            "sum_b": sums[0], "min_b": mins[0],
                            "max_b": maxs[0],
                            "sum_g": sums[1], "min_g": mins[1],
                            "max_g": maxs[1],
                            "sum_r": sums[2], "min_r": mins[2],
                            "max_r": maxs[2],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_STATS_SCHEMA])

    return assets.filter(F.col("modality") == "video").select(
        "asset_id", "payload"
    ).mapInPandas(run, schema=FRAME_STATS_SCHEMA)


def parse_avi_header(data: bytes) -> tuple[int, int, int]:
    """(width, height, total_frames) from the ``avih`` main header of a
    RIFF AVI (fields 8/9/4 of the 14-dword body, per the AVIMAINHEADER
    spec)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    p = data.find(b"avih")
    if p < 0:
        raise ValueError("AVI missing avih main header")
    body = data[p + 8 : p + 8 + 56]
    if len(body) < 56:
        raise ValueError("truncated avih header")
    vals = struct.unpack("<14I", body)
    return vals[8], vals[9], vals[4]


def _mp4_box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def make_mp4(
    width: int, height: int, duration: int, timescale: int = 600
) -> bytes:
    """Minimal structurally-valid ISO-BMFF (MP4): ``ftyp`` +
    ``moov(mvhd, trak(tkhd))`` with spec-layout version-0 headers —
    timescale/duration in ``mvhd``, 16.16 fixed-point width/height in
    ``tkhd``."""
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom" + b"mp41")
    mvhd = _mp4_box(
        b"mvhd",
        struct.pack(">I", 0)                      # version + flags
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">I", 0x00010000)           # rate 1.0
        + struct.pack(">H", 0x0100)               # volume 1.0
        + b"\x00" * 10                            # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24                            # pre_defined
        + struct.pack(">I", 2),                   # next_track_id
    )
    tkhd = _mp4_box(
        b"tkhd",
        struct.pack(">I", 0x000007)               # version + enabled flags
        + struct.pack(">IIII", 0, 0, 1, 0)        # times, track_id, reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8                             # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)        # layer/group/volume/rsvd
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
    )
    moov = _mp4_box(b"moov", mvhd + _mp4_box(b"trak", tkhd))
    return ftyp + moov


def _walk_mp4_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end) —
    the standard size-prefixed ISO-BMFF walk (no find(): a stray tag in
    payload bytes cannot mislead it)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        typ = data[pos + 4 : pos + 8]
        if size < 8 or pos + size > end:
            raise ValueError("malformed ISO-BMFF box")
        yield typ, pos + 8, pos + size
        pos += size


def parse_mp4_header(data: bytes) -> tuple[int, int, int, int]:
    """(width, height, timescale, duration) from moov/mvhd + the first
    trak/tkhd of an ISO-BMFF file."""
    if data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file")
    width = height = timescale = duration = None
    for typ, bs, be in _walk_mp4_boxes(data, 0, len(data)):
        if typ != b"moov":
            continue
        for t2, b2s, b2e in _walk_mp4_boxes(data, bs, be):
            if t2 == b"mvhd":
                timescale, duration = struct.unpack(
                    ">II", data[b2s + 12 : b2s + 20]
                )
            elif t2 == b"trak" and width is None:
                for t3, b3s, b3e in _walk_mp4_boxes(data, b2s, b2e):
                    if t3 == b"tkhd":
                        w166, h166 = struct.unpack(
                            ">II", data[b3e - 8 : b3e]
                        )
                        width, height = w166 >> 16, h166 >> 16
    if timescale is None or width is None:
        raise ValueError("ISO-BMFF missing mvhd/tkhd headers")
    return width, height, timescale, duration


# MPEG-1 Layer III frame-header tables (ISO/IEC 11172-3 §2.4.2.3):
# bitrate index → kbps, sampling-frequency index → Hz. Index 0 is the
# "free" bitrate and 15 is forbidden; 1152 samples per Layer III frame.
_MP3_BITRATES = (
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_MP3_RATES = (44100, 48000, 32000)
_MP3_SAMPLES_PER_FRAME = 1152


def make_mp3(
    n_frames: int, bitrate_kbps: int = 128, samplerate: int = 44100,
    padding_every: int = 0,
) -> bytes:
    """Structurally-valid MPEG-1 Layer III stream: ``n_frames`` frames
    with spec-exact 4-byte headers (sync / version / layer / bitrate /
    samplerate / padding bits) and zeroed main_data — a header WALK
    (frame count, duration, CBR bitrate) parses this exactly like a
    real encoder's output; the audio payload itself is silence-shaped
    filler since Layer III entropy coding is the documented seam.
    ``padding_every=k`` sets the padding bit on every k-th frame (the
    44.1 kHz rate-adaptation case a real CBR stream exhibits)."""
    bidx = _MP3_BITRATES.index(bitrate_kbps)
    ridx = _MP3_RATES.index(samplerate)
    out = bytearray()
    for f in range(n_frames):
        pad = 1 if (padding_every and (f + 1) % padding_every == 0) else 0
        # 0xFF 0xFB = sync + MPEG1 (0b11) + Layer III (0b01) + no-CRC (1)
        hdr = bytes(
            [0xFF, 0xFB, (bidx << 4) | (ridx << 2) | (pad << 1), 0x00]
        )
        frame_len = (144 * bitrate_kbps * 1000) // samplerate + pad
        out += hdr + b"\x00" * (frame_len - 4)
    return bytes(out)


def parse_mp3_frames(data: bytes) -> tuple[int, int, int, int]:
    """Frame-header WALK of an MPEG-1 Layer III stream — stdlib only:
    validates each 4-byte header (sync, version, layer, bitrate and
    samplerate indices), steps by the spec frame-length formula
    ``144 * bitrate / samplerate + padding``, and returns
    ``(samplerate_hz, bitrate_kbps, n_frames, duration_ms)`` with
    duration from 1152 samples per frame. Raises ValueError on broken
    sync or forbidden indices; Layer III entropy DECODE (huffman +
    IMDCT + synthesis filterbank) remains the documented seam."""
    if len(data) < 4 or data[0] != 0xFF or (data[1] & 0xE0) != 0xE0:
        raise ValueError("not an MPEG audio stream")
    p = 0
    n_frames = 0
    bitrate_kbps = samplerate = None
    while p + 4 <= len(data):
        if data[p] != 0xFF or (data[p + 1] & 0xE0) != 0xE0:
            raise ValueError(f"lost frame sync at byte {p}")
        version = (data[p + 1] >> 3) & 0x3
        layer = (data[p + 1] >> 1) & 0x3
        if version != 0b11 or layer != 0b01:
            raise ValueError("only MPEG-1 Layer III frames supported")
        bidx = (data[p + 2] >> 4) & 0xF
        ridx = (data[p + 2] >> 2) & 0x3
        pad = (data[p + 2] >> 1) & 0x1
        if bidx in (0, 15) or ridx == 3:
            raise ValueError("free/forbidden bitrate or samplerate index")
        br = _MP3_BITRATES[bidx]
        sr = _MP3_RATES[ridx]
        if bitrate_kbps is None:
            bitrate_kbps, samplerate = br, sr
        elif (br, sr) != (bitrate_kbps, samplerate):
            raise ValueError("VBR/rate-switch streams not supported")
        frame_len = (144 * br * 1000) // sr + pad
        if p + frame_len > len(data):
            raise ValueError("truncated final MP3 frame")
        p += frame_len
        n_frames += 1
    duration_ms = n_frames * _MP3_SAMPLES_PER_FRAME * 1000 // samplerate
    return samplerate, bitrate_kbps, n_frames, duration_ms


def _decode_real(b: bytes) -> tuple[int, int]:
    """Header-level decode for the formats stdlib can parse. Returns the
    (width, height) feature pair; for audio the temporal dimensions map
    in as (framerate, n_frames). Anything else is genuinely undecodable
    here — that seam stays explicit."""
    b = bytes(b)
    if b[:8] == PNG_MAGIC:
        w, h = parse_png_header(b)
        return int(w), int(h)
    if b[:2] == JPEG_SOI:
        w, h = parse_jpeg_header(b)
        return int(w), int(h)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = parse_gif_header(b)
        return int(w), int(h)
    if b[:2] == b"BM":
        w, h = parse_bmp_header(b)
        return int(w), int(h)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        n_frames, framerate, _, _ = parse_wav_header(b)
        return int(framerate), int(n_frames)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        w, h, _frames = parse_avi_header(b)
        return int(w), int(h)
    if b[4:8] == b"ftyp":
        w, h, _ts, _dur = parse_mp4_header(b)
        return int(w), int(h)
    if len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0:
        samplerate, _bitrate, n_frames, _dur = parse_mp3_frames(b)
        return int(samplerate), int(n_frames)
    raise NotImplementedError(
        "only PNG, JPEG, GIF, BMP, WAV, AVI and MP4 headers are parseable"
        " without media libraries; FULL decode is real for 24bpp BMP"
        " pixels (decode_bmp_pixels), 8/16-bit WAV PCM"
        " (decode_wav_samples), 8-bit PNG pixels (decode_png_pixels,"
        " zlib inflate + unfilter), palette GIF (decode_gif_pixels, LZW)"
        " and baseline sequential JPEG (decode_jpeg_pixels, huffman +"
        " IDCT) — progressive JPEG, MP3, and video frames still need"
        " PIL/ffmpeg; use mode='fake' for format-agnostic plumbing"
    )


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # bmp | wav
        T.StructField("n_units", T.LongType()),  # pixels | frames
        # all-BIGINT stats: uniform integer typing keeps the cross-engine
        # value hash trivially stable (no int32/int64 pandas dtype drift)
        T.StructField("sum_b", T.LongType()),
        T.StructField("min_b", T.LongType()),
        T.StructField("max_b", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("min_g", T.LongType()),
        T.StructField("max_g", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("min_r", T.LongType()),
        T.StructField("max_r", T.LongType()),
    ]
)


def synth_pixel_assets(spark: SparkSession, n: int = 80) -> DataFrame:
    """Deterministic FULLY-DECODABLE assets cycling i%6: 24bpp BMP with
    a real pixel array (``bmp_pixel`` pattern), 8-bit PCM WAV
    (``make_wav`` ramp pattern), 8-bit grayscale PNG (``png_pixel``
    pattern — zlib-compressed, genuinely decompressed+unfiltered on
    decode), single-frame GIF (``gif_pixel`` pattern — genuinely
    LZW-compressed and LZW-decoded), and baseline JPEG (``jpeg_pixel``
    block-constant pattern — genuinely huffman-entropy-decoded +
    IDCT'd, bit-exact because DC-only blocks at quant=1 are the
    lossless corner of the codec; alternating files re-encode the same
    coefficients as 5-scan PROGRESSIVE streams — spectral selection +
    successive approximation — decoding through the Annex G path), and
    multi-frame uncompressed-DIB AVI (``avi_pixel`` pattern — real
    ``movi``/``00db`` frame chunks, demuxed and decoded frame by
    frame). Distributed Arrow-batched generation, same shape as
    ``synth_real_assets``."""
    ensure_worker_imports(spark)

    def build(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i % 6 == 0:
                    payload = make_bmp(5 + i % 13, 3 + i % 7, pixels=True)
                    modality, mime = "image", "image/bmp"
                elif i % 6 == 1:
                    payload = make_wav(40 + i % 160, amplitude=1 + i % 9)
                    modality, mime = "audio", "audio/wav"
                elif i % 6 == 2:
                    payload = make_png(
                        6 + i % 12, 4 + i % 6, pattern=True
                    )
                    modality, mime = "image", "image/png"
                elif i % 6 == 3:
                    payload = make_gif(4 + i % 14, 3 + i % 8, pixels=True)
                    modality, mime = "image", "image/gif"
                elif i % 6 == 4:
                    # alternate baseline / progressive: the block-
                    # constant pattern decodes bit-exactly under BOTH
                    # codecs, so the oracle values are codec-invariant
                    # while the certified query exercises both paths
                    if (i // 6) % 2:
                        payload = make_jpeg_progressive(
                            9 + i % 24, 7 + i % 19
                        )
                    else:
                        payload = make_jpeg_baseline(
                            9 + i % 24, 7 + i % 19,
                            restart_interval=(i % 3),
                        )
                    modality, mime = "image", "image/jpeg"
                else:
                    payload = make_avi(
                        4 + i % 9, 3 + i % 6, 2 + i % 4, pixels=True
                    )
                    modality, mime = "video", "video/x-msvideo"
                rows.append(
                    {
                        "asset_id": i,
                        "modality": modality,
                        "payload": payload,
                        "meta": {
                            "mime": mime,
                            "n_bytes": len(payload),
                            "source_uri": f"synthetic://pixel/{i}",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(build, schema=ASSET_SCHEMA)


def pixel_stats(assets: DataFrame) -> DataFrame:
    """FULL-decode statistics over binary payloads: per-channel integer
    sum/min/max for uncompressed 24bpp BMPs, interleaved PCM sample
    stats for 8/16-bit WAVs. Arrow-batched ``mapInPandas`` — the decode
    loop sees whole record batches, and the per-asset work is O(payload)
    with no cross-row state, so the operator scales with executors."""
    ensure_worker_imports(assets.sparkSession)

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] == b"BM":
                    stats = decode_bmp_pixels(b)
                    kind = "bmp"
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    stats = decode_wav_samples(b)
                    kind = "wav"
                elif b[:8] == PNG_MAGIC:
                    stats = decode_png_pixels(b)
                    kind = "png"
                elif b[:6] in (b"GIF87a", b"GIF89a"):
                    stats = decode_gif_pixels(b)
                    kind = "gif"
                elif b[:2] == JPEG_SOI:
                    stats = decode_jpeg_pixels(b)
                    kind = "jpeg"
                elif b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    stats = decode_avi_frames(b)
                    kind = "avi"
                else:
                    raise NotImplementedError(
                        "pixel_stats full-decodes 24bpp BMP, 8/16-bit"
                        " PCM WAV, 8-bit PNG, palette GIF, baseline +"
                        " progressive JPEG and uncompressed-DIB AVI;"
                        " compressed video codecs and MP3 samples need"
                        " ffmpeg (bounded-scope decision: SURVEY.md"
                        " 'Multimodal codec boundary')"
                    )
                rows.append({"asset_id": int(aid), "kind": kind, **stats})
            yield pd.DataFrame(rows)

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema=PIXEL_STATS_SCHEMA
    )


def synth_real_assets(spark: SparkSession, n: int = 60) -> DataFrame:
    """Deterministic REAL media assets cycling all three modalities:
    id % 5 == 0 → PNG, 1 → WAV, 2 → JPEG (alternating baseline SOF0 /
    progressive SOF2), 3 → AVI, 4 → MP4 (ISO-BMFF); all dimensions
    derived from the id.
    Payload construction needs Python byte-assembly, so it runs as an
    Arrow-batched mapInPandas over ``spark.range`` — the same distributed
    generation shape a backfill job would use (no driver-side loop)."""
    ensure_worker_imports(spark)

    def build(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i % 5 == 0:
                    payload = make_png(16 + i % 48, 16 + (i // 5) % 32)
                    modality, mime = "image", "image/png"
                elif i % 5 == 1:
                    payload = make_wav(50 + i % 200, framerate=8000 + 100 * (i % 4))
                    modality, mime = "audio", "audio/wav"
                elif i % 5 == 2:
                    payload = make_jpeg(
                        32 + i % 64, 24 + (i // 5) % 40,
                        progressive=(i // 5) % 2 == 1,
                    )
                    modality, mime = "image", "image/jpeg"
                elif i % 5 == 3:
                    payload = make_avi(
                        160 + i % 64, 120 + (i // 5) % 48, 24 + i % 100
                    )
                    modality, mime = "video", "video/x-msvideo"
                else:
                    payload = make_mp4(
                        320 + i % 64, 180 + (i // 5) % 48, 600 + i
                    )
                    modality, mime = "video", "video/mp4"
                rows.append(
                    {
                        "asset_id": i,
                        "modality": modality,
                        "payload": payload,
                        "meta": {
                            "mime": mime,
                            "n_bytes": len(payload),
                            "source_uri": f"synthetic://real/{i}",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(build, schema=ASSET_SCHEMA)


def _payload_sha(b) -> str:
    """Content fingerprint: SHA-256 over the lowercase hex encoding of the
    payload. Hex-then-hash (rather than hashing raw bytes) keeps the
    fingerprint reproducible by engines whose hash functions only accept
    strings (DuckDB ``sha256(VARCHAR)``), which is what lets
    ``multimodal_decode`` carry a full value oracle; equal payloads ⟺
    equal fingerprints either way."""
    return hashlib.sha256(bytes(b).hex().encode("ascii")).hexdigest()


def _decode_batch(pdf: pd.DataFrame, mode: str) -> pd.DataFrame:
    if mode == "real":
        dims = pdf["payload"].map(_decode_real)
        return pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "payload_sha": pdf["payload"].map(_payload_sha),
                "width": dims.map(lambda d: d[0]).astype("int32"),
                "height": dims.map(lambda d: d[1]).astype("int32"),
                "mean_byte": pdf["payload"].map(
                    lambda b: sum(bytes(b)) / len(bytes(b))
                ),
            }
        )
    out = {
        "asset_id": pdf["asset_id"],
        "modality": pdf["modality"],
        "n_bytes": pdf["payload"].map(len).astype("int32"),
        "payload_sha": pdf["payload"].map(_payload_sha),
        # fake decode: dimensions derived deterministically from content
        "width": pdf["payload"].map(lambda b: 64 + bytes(b)[0] % 192).astype("int32"),
        "height": pdf["payload"].map(lambda b: 64 + bytes(b)[1] % 192).astype("int32"),
        "mean_byte": pdf["payload"].map(
            lambda b: sum(bytes(b)) / len(bytes(b))
        ),
    }
    return pd.DataFrame(out)


def decode_features(assets: DataFrame, mode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""
    ensure_worker_imports(assets.sparkSession)

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf, mode)

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def resize(
    assets: DataFrame, target_w: int = 64, target_h: int = 64, mode: str = "fake"
) -> DataFrame:
    """Image-resize plumbing: Arrow-batched transform emitting a resized
    payload + updated metadata. ``mode="fake"`` deterministically
    truncates/pads the payload to target_w*target_h/64 bytes (stand-in
    for the decoded-pixels buffer); ``mode="real"`` genuinely resizes
    uncompressed 24bpp BMPs (nearest-neighbor via ``resize_bmp``) and
    raises only for compressed formats, where PIL would be needed."""
    ensure_worker_imports(assets.sparkSession)
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    n_bytes = max(1, target_w * target_h // 64)

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                def real_resize(b):
                    b = bytes(b)
                    if b[:2] != b"BM":
                        raise NotImplementedError(
                            "real resize covers uncompressed 24bpp BMP;"
                            " compressed formats need PIL"
                        )
                    return resize_bmp(b, target_w, target_h)

                yield pd.DataFrame(
                    {
                        "asset_id": pdf["asset_id"],
                        "payload": pdf["payload"].map(real_resize),
                        "width": target_w,
                        "height": target_h,
                    }
                )
                continue
            payloads = pdf["payload"].map(
                lambda b: (bytes(b) * (n_bytes // max(len(bytes(b)), 1) + 1))[
                    :n_bytes
                ]
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": payloads,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return assets.filter(F.col("modality") == "image").select(
        "asset_id", "payload"
    ).mapInPandas(run, out_schema)


def frame_sample(assets: DataFrame, every_n_bytes: int = 16) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled offset (the
    stand-in for per-frame decode), pure column expressions."""
    return (
        assets.filter(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.length("payload") - 1,
                    F.lit(every_n_bytes),
                )
            ).alias("frame_offset"),
        )
    )
