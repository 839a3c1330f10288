"""Multimodal columns: binary payloads + typed metadata, processed via
Arrow-batched mapInPandas (the only sane shape for decode at 100 TB —
bytes never leave the executor, Python sees Arrow batches, the schema is
explicit so Catalyst can prune around the UDF).

Real codec paths run on pure stdlib (+numpy): PNG (zlib inflate +
scanline unfilter — 8-bit gray/RGB/RGBA, all 5 filter types), BMP
(24bpp), GIF (full LZW), baseline JPEG (canonical huffman entropy
decode, dequantize, orthonormal 8x8 IDCT — luma plane, restart markers,
interleaved multi-component), WAV (RIFF PCM via the `wave` module), and
YUV4MPEG2 video (header parse + per-FRAME luma extraction). The binary
column is format-sniffed per cell, so real and SYNTH payloads mix freely
in one table. Progressive JPEG and COMPRESSED video (mp4/webm) genuinely
need a codec library the container lacks and degrade to container/SOF
metadata rows (clearly-marked NotImplementedError at the decode layer);
the deterministic SYNTH formats keep the full Spark-side plumbing —
binary column handling, batch iteration, schema contract, partition
parallelism — real and tested for all three modalities.

SYNTH image format (deterministic fake, for plumbing tests):
  bytes 0-3   width  (big-endian uint32)
  bytes 4-7   height (big-endian uint32)
  bytes 8..   row-major grayscale pixels (1 byte each)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source_uri", T.StringType(), True),
                    T.StructField("content_length", T.LongType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_pixels long, "
    "mean_intensity double, max_intensity int"
)


def encode_synth_image(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic SYNTH image for tests (pixel = (x*31 + y*7 + seed) % 256)."""
    header = struct.pack(">II", width, height)
    pixels = bytes(
        (x * 31 + y * 7 + seed) % 256 for y in range(height) for x in range(width)
    )
    return header + pixels


def _decode_synth(content: bytes) -> tuple[int, int, bytes]:
    if len(content) < 8:
        raise NotImplementedError("unrecognized image payload (too short)")
    width, height = struct.unpack(">II", content[:8])
    # the header must account for the payload exactly — otherwise this is
    # foreign bytes that would silently "decode" to absurd dimensions
    if width <= 0 or height <= 0 or len(content) != 8 + width * height:
        raise NotImplementedError("unrecognized image payload (not SYNTH)")
    return width, height, content[8 : 8 + width * height]


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal real PNG encoder (8-bit grayscale, filter 0, one IDAT) —
    pure stdlib; lets tests exercise the real decode path end to end."""
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_real_image(content: bytes) -> tuple[int, int, bytes]:
    """REAL PNG decode on pure stdlib: chunk walk, zlib inflate, and
    per-scanline unfilter (all 5 PNG filter types: None/Sub/Up/Average/
    Paeth). Supports 8-bit depth, non-interlaced, grayscale / gray+alpha /
    RGB / RGBA; color is reduced to ITU-R 601 luma so every image lands in
    the same (width, height, grayscale bytes) contract as SYNTH. Raises
    NotImplementedError for non-PNG bytes or unsupported PNG variants."""
    import zlib

    content = bytes(content)
    if content[:8] != _PNG_MAGIC:
        raise NotImplementedError("not a PNG payload (and not SYNTH)")
    pos, idat = 8, bytearray()
    width = height = bit_depth = color_type = interlace = None
    while pos + 8 <= len(content):
        (ln,) = struct.unpack(">I", content[pos : pos + 4])
        typ = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if width is None or bit_depth != 8 or interlace != 0 or color_type not in (0, 2, 4, 6):
        raise NotImplementedError(
            "PNG subset: 8-bit, non-interlaced, gray / gray+alpha / RGB / RGBA"
        )
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    bpp = channels  # bytes per pixel at 8-bit depth
    prev = bytearray(stride)
    gray = bytearray()
    p = 0
    for _y in range(height):
        filt = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if filt == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif filt == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif filt == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif filt != 0:
            raise NotImplementedError(f"unknown PNG filter {filt}")
        prev = line
        if channels == 1:
            gray += line
        elif channels == 2:  # gray + alpha: keep gray
            gray += line[0::2]
        else:  # RGB / RGBA -> 601 luma
            for i in range(0, stride, channels):
                gray.append(
                    (299 * line[i] + 587 * line[i + 1] + 114 * line[i + 2] + 500) // 1000
                )
    return width, height, bytes(gray)


_BMP_MAGIC = b"BM"
_GIF_MAGIC = b"GIF8"


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Real BMP encoder (BITMAPINFOHEADER, 24bpp uncompressed, bottom-up,
    4-byte-padded rows) from grayscale luma — pure stdlib test fixture."""
    stride_pad = (-(width * 3)) % 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up row order
        row = bytearray()
        for x in range(width):
            v = pixels[y * width + x]
            row += bytes((v, v, v))  # BGR
        rows.append(bytes(row) + b"\x00" * stride_pad)
    data = b"".join(rows)
    off = 14 + 40
    file_hdr = _BMP_MAGIC + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + data


def decode_real_bmp(content: bytes) -> tuple[int, int, bytes]:
    """REAL BMP decode on pure stdlib: 24bpp uncompressed
    (BITMAPINFOHEADER or later), bottom-up or top-down, BGR reduced to
    the same 601 luma contract as PNG. Raises NotImplementedError for
    non-BMP bytes, other bit depths, or RLE compression."""
    import numpy as np

    raw = bytes(content)
    if raw[:2] != _BMP_MAGIC:
        raise NotImplementedError("not a BMP payload")
    if len(raw) < 54:  # 14-byte file header + 40-byte BITMAPINFOHEADER
        raise NotImplementedError("BMP payload truncated before headers")
    off = struct.unpack_from("<I", raw, 10)[0]
    hsize = struct.unpack_from("<I", raw, 14)[0]
    if hsize < 40:
        raise NotImplementedError("BMP subset: BITMAPINFOHEADER or later")
    w, h = struct.unpack_from("<ii", raw, 18)
    bpp = struct.unpack_from("<H", raw, 28)[0]
    comp = struct.unpack_from("<I", raw, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError("BMP subset: 24bpp uncompressed only")
    top_down, h = h < 0, abs(h)
    stride = (w * 3 + 3) & ~3
    # hostile/truncated headers: dims must be positive and the claimed
    # pixel grid must actually fit in the buffer, or np.frombuffer below
    # raises (or worse, a negative stride "works") — reject explicitly
    if w <= 0 or h == 0 or off < 54 or off + h * stride > len(raw):
        raise NotImplementedError("BMP header inconsistent with payload size")
    grid = np.frombuffer(raw, np.uint8, count=h * stride, offset=off).reshape(h, stride)
    bgr = grid[:, : w * 3].reshape(h, w, 3).astype(np.int32)
    if not top_down:
        bgr = bgr[::-1]
    luma = (299 * bgr[:, :, 2] + 587 * bgr[:, :, 1] + 114 * bgr[:, :, 0] + 500) // 1000
    return w, h, luma.astype(np.uint8).tobytes()


def encode_gif_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Real GIF89a encoder (256-entry grayscale palette, uncompressed-
    style LZW: CLEAR before every literal keeps encoder and decoder code
    tables trivially in sync) — pure stdlib test fixture."""
    hdr = b"GIF89a" + struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    palette = bytes(v for i in range(256) for v in (i, i, i))
    img_desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    min_code = 8
    clear, end = 1 << min_code, (1 << min_code) + 1
    bits = bytearray()
    acc = n_acc = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, n_acc
        acc |= code << n_acc
        n_acc += size
        while n_acc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8

    for p in pixels:
        emit(clear, min_code + 1)
        emit(p, min_code + 1)
    emit(end, min_code + 1)
    if n_acc:
        bits.append(acc & 0xFF)
    blocks = b"".join(
        bytes([min(255, len(bits) - i)]) + bytes(bits[i : i + 255])
        for i in range(0, len(bits), 255)
    )
    return hdr + palette + img_desc + bytes([min_code]) + blocks + b"\x00" + b"\x3b"


def _gif_lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    code_size = min_code_size + 1
    table = {i: bytes([i]) for i in range(clear)}
    next_code, prev = end + 1, None
    out = bytearray()
    bitpos, total = 0, len(data) * 8
    while bitpos + code_size <= total:
        code = 0
        for i in range(code_size):
            code |= ((data[(bitpos + i) >> 3] >> ((bitpos + i) & 7)) & 1) << i
        bitpos += code_size
        if code == clear:
            table = {i: bytes([i]) for i in range(clear)}
            next_code, code_size, prev = end + 1, min_code_size + 1, None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[next_code] = prev + entry[:1]
            next_code += 1
        else:  # the KwKwK case
            entry = prev + prev[:1]
            table[next_code] = entry
            next_code += 1
        out += entry
        prev = entry
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out)


def decode_real_gif(content: bytes) -> tuple[int, int, bytes]:
    """REAL GIF decode on pure stdlib: header + color tables + block walk
    + full LZW decompression (variable code width, CLEAR/END, the KwKwK
    case). First image frame only, composed onto the logical screen;
    palette colors reduce to 601 luma. Raises NotImplementedError for
    non-GIF bytes or interlaced images."""
    raw = bytes(content)
    if raw[:4] != _GIF_MAGIC:
        raise NotImplementedError("not a GIF payload")
    w, h = struct.unpack_from("<HH", raw, 6)
    flags = raw[10]
    pos = 13
    gct = b""
    if flags & 0x80:
        n = 3 * (2 ** ((flags & 7) + 1))
        gct = raw[pos : pos + n]
        pos += n
    while pos < len(raw):
        b0 = raw[pos]
        if b0 == 0x21:  # extension block: label, then sub-blocks
            pos += 2
            while raw[pos] != 0:
                pos += raw[pos] + 1
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            ix, iy, iw, ih = struct.unpack_from("<HHHH", raw, pos + 1)
            iflags = raw[pos + 9]
            pos += 10
            if iflags & 0x40:
                raise NotImplementedError("GIF subset: interlace not supported")
            ct = gct
            if iflags & 0x80:
                n = 3 * (2 ** ((iflags & 7) + 1))
                ct = raw[pos : pos + n]
                pos += n
            min_code = raw[pos]
            pos += 1
            data = bytearray()
            while raw[pos] != 0:
                n = raw[pos]
                data += raw[pos + 1 : pos + 1 + n]
                pos += n + 1
            idx = _gif_lzw_decode(bytes(data), min_code)
            canvas = bytearray(w * h)
            for row in range(ih):
                for col in range(iw):
                    p = idx[row * iw + col] * 3
                    luma = (299 * ct[p] + 587 * ct[p + 1] + 114 * ct[p + 2] + 500) // 1000
                    canvas[(iy + row) * w + (ix + col)] = luma
            return w, h, bytes(canvas)
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise NotImplementedError("GIF: unrecognized block")
    raise NotImplementedError("GIF: no image data found")


_JPEG_MAGIC = b"\xff\xd8\xff"


def parse_jpeg_metadata(content: bytes) -> dict:
    """Marker-walk metadata from a JPEG payload without a DCT decoder:
    {width, height, n_components, progressive}. Full pixel decode needs
    huffman+IDCT (a codec lib), so like mp4/webm the pipeline degrades
    to container metadata; dims come from the first SOF segment. Raises
    NotImplementedError on non-JPEG bytes."""
    raw = bytes(content)
    if raw[:3] != _JPEG_MAGIC:
        raise NotImplementedError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            break
        marker = raw[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # standalone
            pos += 2
            continue
        seg_len = int.from_bytes(raw[pos + 2 : pos + 4], "big")
        # SOF0-SOF15 minus DHT(C4)/JPG(C8)/DAC(CC) carry the frame header
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h = int.from_bytes(raw[pos + 5 : pos + 7], "big")
            w = int.from_bytes(raw[pos + 7 : pos + 9], "big")
            return {
                "width": w,
                "height": h,
                "n_components": raw[pos + 9],
                "progressive": marker == 0xC2,
            }
        if marker == 0xDA:  # start of scan: entropy data follows, no SOF seen
            break
        pos += 2 + seg_len
    raise NotImplementedError("JPEG: no SOF frame header found")


# -- Baseline JPEG (SOF0/SOF1) luma decode, pure stdlib + numpy ---------
#
# The dominant real-world image format, decoded without a codec library:
# marker walk (DQT/DHT/SOF/DRI/SOS), canonical huffman reconstruction,
# entropy decode with byte-stuffing and restart markers, dequantize,
# de-zigzag, orthonormal 8x8 IDCT (JPEG's 1/4*C(u)C(v) convention IS the
# orthonormal 2D DCT-II), level shift — for the LUMA component, which is
# exactly the grayscale contract every other image decoder here lands in.
# Chroma blocks are entropy-decoded (the bitstream demands it) but not
# inverse-transformed. Progressive (SOF2) and arithmetic-coded JPEGs
# still degrade to the parse_jpeg_metadata path.

def _gen_zigzag() -> list[tuple[int, int]]:
    """The standard JPEG zigzag as a diagonal walk (generated, not
    transcribed): odd diagonals run top-right -> bottom-left (row
    ascending), even ones bottom-left -> top-right (row descending)."""
    out = []
    for s in range(15):
        rows = list(range(max(0, s - 7), min(s, 7) + 1))
        if s % 2 == 0:
            rows.reverse()
        out.extend((r, s - r) for r in rows)
    return out


_ZIGZAG = _gen_zigzag()


def _dct_matrix():
    """Orthonormal 8-point DCT-II matrix M: F = M f M^T, f = M^T F M."""
    import math

    import numpy as np

    m = np.zeros((8, 8))
    for u in range(8):
        c = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
        for x in range(8):
            m[u, x] = c * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


class _HuffTable:
    """Canonical JPEG huffman table: (length, code) -> symbol."""

    def __init__(self, bits: list[int], huffval: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = huffval[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """Entropy-segment bit reader: handles 0xFF00 byte stuffing; stops at
    any real marker (restarts are consumed explicitly by the caller)."""

    def __init__(self, raw: bytes, pos: int):
        self.raw, self.pos, self.acc, self.n = raw, pos, 0, 0

    def _fill(self) -> None:
        b = self.raw[self.pos]
        if b == 0xFF:
            nxt = self.raw[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                raise _MarkerReached()
            else:
                raise NotImplementedError("JPEG: unexpected marker in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise NotImplementedError("JPEG: invalid huffman code")

    def restart(self) -> None:
        """Consume an RSTn marker at an MCU boundary: drop to byte
        alignment and step over FFD0-FFD7."""
        self.acc, self.n = 0, 0
        while self.raw[self.pos] != 0xFF or self.raw[self.pos + 1] == 0x00:
            self.pos += 1  # skip pad bits' stuffed bytes, if any
        if 0xD0 <= self.raw[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise NotImplementedError("JPEG: missing restart marker")


class _MarkerReached(Exception):
    pass


def _receive_extend(r: "_BitReader", s: int) -> int:
    if s == 0:
        return 0
    v = r.bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_real_jpeg(content: bytes) -> tuple[int, int, bytes]:
    """REAL baseline JPEG decode (SOF0/SOF1, huffman, interleaved single
    scan): returns (width, height, luma bytes) like every other image
    decoder here. Raises NotImplementedError for progressive/arithmetic/
    multi-scan variants (those degrade to metadata via the SOF walk)."""
    import numpy as np

    raw = bytes(content)
    if raw[:3] != _JPEG_MAGIC:
        raise NotImplementedError("not a JPEG payload")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    comps: list[dict] = []
    w = h = None
    restart_interval = 0
    while True:
        if pos + 4 > len(raw):
            raise NotImplementedError("JPEG: truncated before SOS")
        if raw[pos] != 0xFF:
            raise NotImplementedError("JPEG: marker desync")
        marker = raw[pos + 1]
        if marker == 0xD9:  # EOI before any scan: metadata-only fixture
            raise NotImplementedError("JPEG: no scan data")
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = int.from_bytes(raw[pos + 2 : pos + 4], "big")
        body, seg_end = pos + 4, pos + 2 + seg_len
        if marker == 0xDB:  # DQT
            p = body
            while p < seg_end:
                prec, tid = raw[p] >> 4, raw[p] & 0xF
                if prec == 0:
                    qt[tid] = list(raw[p + 1 : p + 65])
                    p += 65
                else:  # 16-bit table
                    qt[tid] = [
                        int.from_bytes(raw[p + 1 + 2 * i : p + 3 + 2 * i], "big")
                        for i in range(64)
                    ]
                    p += 129
        elif marker == 0xC4:  # DHT
            p = body
            while p < seg_end:
                cls, tid = raw[p] >> 4, raw[p] & 0xF
                bits = list(raw[p + 1 : p + 17])
                n = sum(bits)
                huff[(cls, tid)] = _HuffTable(bits, raw[p + 17 : p + 17 + n])
                p += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(raw[body : body + 2], "big")
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            if raw[body] != 8:
                raise NotImplementedError("JPEG subset: 8-bit precision only")
            h = int.from_bytes(raw[body + 1 : body + 3], "big")
            w = int.from_bytes(raw[body + 3 : body + 5], "big")
            for i in range(raw[body + 5]):
                cp = body + 6 + 3 * i
                comps.append(
                    {
                        "id": raw[cp],
                        "h": raw[cp + 1] >> 4,
                        "v": raw[cp + 1] & 0xF,
                        "tq": raw[cp + 2],
                    }
                )
        elif marker == 0xC2:
            raise NotImplementedError("JPEG subset: progressive not supported")
        elif 0xC3 <= marker <= 0xCF and marker != 0xC4:
            raise NotImplementedError("JPEG subset: unsupported SOF variant")
        elif marker == 0xDA:  # SOS
            ns = raw[body]
            if not comps or w is None:
                raise NotImplementedError("JPEG: SOS before SOF")
            if ns != len(comps):
                raise NotImplementedError("JPEG subset: multi-scan not supported")
            scan_tables = {}
            for i in range(ns):
                cid, tbls = raw[body + 1 + 2 * i], raw[body + 2 + 2 * i]
                scan_tables[cid] = (tbls >> 4, tbls & 0xF)
            pos = body + 1 + 2 * ns + 3  # skip Ss/Se/AhAl
            break
        pos = seg_end

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    luma = comps[0]
    lw, lv = luma["h"], luma["v"]
    plane = np.zeros((mcus_y * lv * 8, mcus_x * lw * 8), dtype=np.float64)
    lqt = np.array(qt[luma["tq"]], dtype=np.float64)
    m = _dct_matrix()
    rd = _BitReader(raw, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    zz_rows = np.array([r for r, _ in _ZIGZAG])
    zz_cols = np.array([c for _, c in _ZIGZAG])
    try:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    rd.restart()
                    pred = {c["id"]: 0 for c in comps}
                mcu_count += 1
                for ci, c in enumerate(comps):
                    dc_t = huff[(0, scan_tables[c["id"]][0])]
                    ac_t = huff[(1, scan_tables[c["id"]][1])]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coeffs = np.zeros(64)
                            s = rd.decode(dc_t)
                            pred[c["id"]] += _receive_extend(rd, s)
                            coeffs[0] = pred[c["id"]]
                            k = 1
                            while k < 64:
                                rs = rd.decode(ac_t)
                                r, s = rs >> 4, rs & 0xF
                                if s == 0:
                                    if r == 15:  # ZRL
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise NotImplementedError("JPEG: AC overrun")
                                coeffs[k] = _receive_extend(rd, s)
                                k += 1
                            if ci == 0:  # luma: dequant + IDCT
                                blk = np.zeros((8, 8))
                                blk[zz_rows, zz_cols] = coeffs * lqt
                                spatial = m.T @ blk @ m + 128.0
                                y0 = (my * lv + by) * 8
                                x0 = (mx * lw + bx) * 8
                                plane[y0 : y0 + 8, x0 : x0 + 8] = spatial
    except _MarkerReached:
        pass  # truncated-but-decodable tail: keep what we have
    # luma plane at its natural resolution, then nearest-neighbor to (w,h)
    cw, ch = -(-w * lw // hmax), -(-h * lv // vmax)
    plane = plane[:ch, :cw]
    if (ch, cw) != (h, w):
        ys = (np.arange(h) * ch // h).clip(0, ch - 1)
        xs = (np.arange(w) * cw // w).clip(0, cw - 1)
        plane = plane[np.ix_(ys, xs)]
    return w, h, np.clip(np.round(plane), 0, 255).astype(np.uint8).tobytes()


def encode_baseline_jpeg_gray(
    width: int, height: int, pixels: bytes, *, color: bool = False, restart_interval: int = 0
) -> bytes:
    """Real baseline JPEG encoder (quant table of ones, per-image
    canonical huffman tables) — pure stdlib + numpy test fixture. With
    unit quantization the only loss is DCT rounding, so
    decode(encode(px)) round-trips within ~1 intensity level.

    ``color=True`` emits a 3-component YCbCr stream (1x1 sampling,
    neutral chroma) so tests exercise the decoder's interleaved
    multi-component path; ``restart_interval=N`` emits DRI + RSTn
    markers every N MCUs to exercise the restart path."""
    import numpy as np

    m = _dct_matrix()
    img = np.frombuffer(pixels, np.uint8).reshape(height, width).astype(np.float64)
    bh, bw = -(-height // 8), -(-width // 8)
    padded = np.empty((bh * 8, bw * 8))
    padded[:height, :width] = img
    padded[height:, :width] = img[-1:, :]  # edge-replicate padding
    padded[:, width:] = padded[:, width - 1 : width]
    zz_rows = np.array([r for r, _ in _ZIGZAG])
    zz_cols = np.array([c for _, c in _ZIGZAG])
    n_comp = 3 if color else 1

    def category(v: int) -> int:
        return int(v).bit_length() if v >= 0 else int(-v).bit_length()

    # pass 1: quantized coefficients per MCU (one luma block + optional
    # neutral chroma blocks), restart-aware DC prediction, symbol stats
    mcus, dc_syms, ac_syms = [], set(), {0x00}
    preds = [0] * n_comp
    mcu_idx = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                preds = [0] * n_comp
            mcu_idx += 1
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coeffs = np.round(m @ blk @ m.T).astype(np.int64)
            zz = coeffs[zz_rows, zz_cols]
            dc_diff = int(zz[0]) - preds[0]
            preds[0] = int(zz[0])
            dc_syms.add(category(dc_diff))
            run, acs = 0, []
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    acs.append((0xF0, 0, 0))
                    run -= 16
                s = category(v)
                acs.append(((run << 4) | s, s, v))
                run = 0
            if run:
                acs.append((0x00, 0, 0))  # EOB
            for sym, _, _ in acs:
                ac_syms.add(sym)
            group = [(dc_diff, acs)]
            for _ in range(n_comp - 1):  # neutral chroma: DC 0 + EOB
                group.append((0, [(0x00, 0, 0)]))
            dc_syms.add(0)
            mcus.append(group)

    def flat_table(symbols: set[int]) -> tuple[list[int], bytes, dict[int, tuple[int, int]]]:
        """Fixed-length canonical codes: n symbols at length L where
        2^L - 1 >= n, so the all-ones code stays unused (spec rule)."""
        ordered = sorted(symbols)
        length = max(2, (len(ordered)).bit_length())
        while (1 << length) - 1 < len(ordered):
            length += 1
        bits = [0] * 16
        bits[length - 1] = len(ordered)
        codes = {sym: (length, i) for i, sym in enumerate(ordered)}
        return bits, bytes(ordered), codes

    dc_bits, dc_vals, dc_codes = flat_table(dc_syms)
    ac_bits, ac_vals, ac_codes = flat_table(ac_syms)

    out = bytearray()
    acc = [0, 0]  # bit accumulator, count

    def emit(code: int, n: int) -> None:
        acc[0] = (acc[0] << n) | code
        acc[1] += n
        while acc[1] >= 8:
            acc[1] -= 8
            b = (acc[0] >> acc[1]) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0x00)

    def pad_to_byte() -> None:
        if acc[1]:
            emit((1 << (8 - acc[1])) - 1, 8 - acc[1])  # 1-pad

    def amplitude(v: int, s: int) -> int:
        return v if v >= 0 else v + (1 << s) - 1

    for i, group in enumerate(mcus):
        if restart_interval and i and i % restart_interval == 0:
            pad_to_byte()
            out.extend((0xFF, 0xD0 + ((i // restart_interval - 1) % 8)))
        for dc_diff, acs in group:
            s = category(dc_diff)
            emit(*reversed(dc_codes[s]))
            if s:
                emit(amplitude(dc_diff, s), s)
            for sym, sz, v in acs:
                emit(*reversed(ac_codes[sym]))
                if sz:
                    emit(amplitude(v, sz), sz)
    pad_to_byte()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    comp_specs = b"".join(bytes([cid + 1, 0x11, 0]) for cid in range(n_comp))
    sof = seg(
        0xC0,
        bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([n_comp])
        + comp_specs,
    )
    dht = seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals) + seg(
        0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals
    )
    dri = seg(0xDD, restart_interval.to_bytes(2, "big")) if restart_interval else b""
    sos = seg(
        0xDA,
        bytes([n_comp])
        + b"".join(bytes([cid + 1, 0x00]) for cid in range(n_comp))
        + bytes([0, 63, 0]),
    )
    return b"\xff\xd8" + dqt + sof + dht + dri + sos + bytes(out) + b"\xff\xd9"


def encode_minimal_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG fixture: SOI + APP0/JFIF + SOF0 + EOI — a container
    with a frame header but no entropy-coded stream (dims parse, decode
    can't). Pure stdlib, test fixture only."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x11\x00"
    )
    return _JPEG_MAGIC[:2] + app0 + sof0 + b"\xff\xd9"


def _decode_image(content: bytes) -> tuple[int, int, bytes]:
    """Format-sniffing decode: real PNG/BMP/GIF/JPEG when a magic
    matches, SYNTH otherwise — one binary column carries all of them.
    Unsupported JPEG variants (progressive, multi-scan) raise
    NotImplementedError here and degrade to the SOF metadata walk in
    extract_image_features."""
    content = bytes(content)
    if content[:8] == _PNG_MAGIC:
        return decode_real_image(content)
    if content[:2] == _BMP_MAGIC:
        return decode_real_bmp(content)
    if content[:4] == _GIF_MAGIC:
        return decode_real_gif(content)
    if content[:3] == _JPEG_MAGIC:
        return decode_real_jpeg(content)
    return _decode_synth(content)


def extract_image_features(media: DataFrame) -> DataFrame:
    """Distributed feature extraction over a binary image column.

    mapInPandas: executors receive Arrow record batches; the binary cells
    are numpy object arrays of bytes. Nothing is collected to the driver;
    parallelism = input partitions.
    """

    def features(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "n_pixels", "mean_intensity", "max_intensity")}
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                raw = bytes(content)
                try:
                    w, h, px = _decode_image(raw)
                except Exception:
                    # undecodable OR corrupt cell: degrade to metadata where
                    # the container is parseable (JPEG dims via SOF walk),
                    # else an auditable null-metrics row — never a task
                    # failure. Catching Exception (not just the decoders'
                    # NotImplementedError) matters: truncated downloads that
                    # still match a magic raise struct.error / ValueError /
                    # IndexError from the decode internals, and a 100 TB
                    # crawl always has truncated downloads.
                    meta_w = meta_h = None
                    if raw[:3] == _JPEG_MAGIC:
                        try:
                            m = parse_jpeg_metadata(raw)
                            meta_w, meta_h = m["width"], m["height"]
                        except Exception:
                            pass
                    out["media_id"].append(media_id)
                    out["width"].append(meta_w)
                    out["height"].append(meta_h)
                    for k in ("n_pixels", "mean_intensity", "max_intensity"):
                        out[k].append(None)
                    continue
                arr = np.frombuffer(px, dtype=np.uint8)
                out["media_id"].append(media_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(len(arr))
                out["mean_intensity"].append(float(arr.mean()) if len(arr) else 0.0)
                out["max_intensity"].append(int(arr.max()) if len(arr) else 0)
            yield pd.DataFrame(out)

    return media.filter(F.col("media_type") == "image").select("media_id", "content").mapInPandas(
        features, IMAGE_FEATURES_SCHEMA
    )


RESIZE_SCHEMA = "media_id long, content binary"


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbor resize of SYNTH images, emitted as new binary
    content — the write-back direction of the multimodal pipeline."""

    def resize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                try:
                    w, h, px = _decode_image(bytes(content))
                except Exception:
                    # undecodable or corrupt (truncated-but-magic-matching)
                    # cell: skip, don't kill the shard
                    continue
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
                ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
                xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
                resized = arr[np.ix_(ys, xs)]
                ids.append(media_id)
                blobs.append(struct.pack(">II", target_w, target_h) + resized.tobytes())
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    return media.filter(F.col("media_type") == "image").select("media_id", "content").mapInPandas(
        resize, RESIZE_SCHEMA
    )


# SYNTH video: 12-byte header (frame count, width, height — big-endian
# uint32 each) + n_frames row-major grayscale frames back to back. A real
# deployment swaps _decode_synth_video for the codec stub below; the
# Spark-side shape (binary in, one row PER SAMPLED FRAME out, Arrow
# batches, no driver involvement) is identical.

FRAME_SAMPLE_SCHEMA = (
    "media_id long, frame_idx int, n_frames int, width int, height int, "
    "mean_intensity double, frame_content binary"
)


def encode_synth_video(width: int, height: int, n_frames: int, seed: int = 0) -> bytes:
    """Deterministic SYNTH video (frame f pixel = (x*31 + y*7 + f*13 + seed) % 256)."""
    header = struct.pack(">III", n_frames, width, height)
    frames = b"".join(
        bytes((x * 31 + y * 7 + f * 13 + seed) % 256 for y in range(height) for x in range(width))
        for f in range(n_frames)
    )
    return header + frames


def _decode_synth_video(content: bytes) -> tuple[int, int, int, bytes]:
    if len(content) < 12:
        raise NotImplementedError("unrecognized video payload (too short)")
    n_frames, width, height = struct.unpack(">III", content[:12])
    if (
        width <= 0
        or height <= 0
        or n_frames < 0
        or len(content) != 12 + n_frames * width * height
    ):
        raise NotImplementedError("unrecognized video payload (not SYNTH)")
    return n_frames, width, height, content[12:]


def sample_video_frames(media: DataFrame, every_n: int) -> DataFrame:
    """Distributed frame sampling: one output row per kept frame (every
    ``every_n``-th, always including frame 0), carrying the frame bytes as
    a SYNTH image plus a cheap per-frame feature. The generator shape
    (one input row -> many output rows inside mapInPandas) is the 100 TB
    pattern for frame extraction: bytes stay on executors, downstream
    image operators consume frame_content directly."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def sample(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        cols = ("media_id", "frame_idx", "n_frames", "width", "height",
                "mean_intensity", "frame_content")
        for pdf in batches:
            out = {k: [] for k in cols}
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None or len(content) < 12:
                    continue
                raw = bytes(content)
                if _is_mp4(raw) or raw[:4] == _EBML_MAGIC:
                    # Codec-less container (mp4/webm): degrade to ONE
                    # metadata row (frame_idx = -1, no frame bytes) instead
                    # of killing the shard — dims come from the box walk.
                    # The walk itself must also never kill the shard: a
                    # malformed container (e.g. an EBML Duration element
                    # of unexpected width) raises struct.error — skip it.
                    try:
                        m = (
                            parse_mp4_metadata(raw)
                            if _is_mp4(raw)
                            else parse_webm_metadata(raw)
                        )
                    except Exception:
                        continue
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(-1)
                    out["n_frames"].append(0)
                    out["width"].append(m["width"])
                    out["height"].append(m["height"])
                    out["mean_intensity"].append(None)
                    out["frame_content"].append(None)
                    continue
                try:
                    n_frames, w, h, px = _decode_video(raw)
                except Exception:
                    # foreign or corrupt bytes: skip the cell, not the shard
                    continue
                frame_len = w * h
                for f in range(0, n_frames, every_n):
                    frame = px[f * frame_len : (f + 1) * frame_len]
                    arr = np.frombuffer(frame, dtype=np.uint8)
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(f)
                    out["n_frames"].append(n_frames)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["mean_intensity"].append(float(arr.mean()) if len(arr) else 0.0)
                    # emit as SYNTH image so resize/feature ops compose
                    out["frame_content"].append(struct.pack(">II", w, h) + frame)
            yield pd.DataFrame(out)

    return media.filter(F.col("media_type") == "video").select("media_id", "content").mapInPandas(
        sample, FRAME_SAMPLE_SCHEMA
    )


_Y4M_MAGIC = b"YUV4MPEG2"
_Y4M_CHROMA_SIZE = {
    "420": lambda w, h: w * h * 3 // 2,  # C420, C420jpeg, C420mpeg2, C420paldv
    "422": lambda w, h: w * h * 2,
    "444": lambda w, h: w * h * 3,
    "mono": lambda w, h: w * h,
}


def encode_y4m(width: int, height: int, frames: list[bytes]) -> bytes:
    """Real YUV4MPEG2 encoder (C420jpeg, luma planes given, neutral
    chroma) — pure stdlib; lets tests exercise the real video decode."""
    header = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420jpeg\n".encode()
    chroma = b"\x80" * (width * height // 2)
    return header + b"".join(b"FRAME\n" + f + chroma for f in frames)


def decode_real_video(content: bytes) -> tuple[int, int, int, bytes]:
    """REAL video decode for YUV4MPEG2 (y4m) on pure stdlib: header
    parse, per-FRAME walk, luma-plane extraction (chroma is skipped so
    every frame lands in the same grayscale contract as SYNTH). Returns
    (n_frames, width, height, concatenated luma bytes). Compressed
    containers (mp4/webm/avi) genuinely need a codec library the
    container lacks — those still raise NotImplementedError."""
    content = bytes(content)
    if content[: len(_Y4M_MAGIC)] != _Y4M_MAGIC:
        raise NotImplementedError(
            "real video decode supports uncompressed y4m only; compressed "
            "containers need pyav/opencv (not in this container)"
        )
    nl = content.index(b"\n")
    width = height = None
    chroma = "420"
    for tok in content[len(_Y4M_MAGIC) : nl].split():
        tag, val = chr(tok[0]), tok[1:].decode()
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "C":
            chroma = "mono" if val.startswith("mono") else val[:3]
    if not width or not height or chroma not in _Y4M_CHROMA_SIZE:
        raise NotImplementedError("y4m subset: W/H required, C420/422/444/mono")
    frame_len = _Y4M_CHROMA_SIZE[chroma](width, height)
    luma_len = width * height
    pos, planes, n_frames = nl + 1, bytearray(), 0
    while pos < len(content):
        if content[pos : pos + 5] != b"FRAME":
            raise NotImplementedError("malformed y4m FRAME marker")
        pos = content.index(b"\n", pos) + 1  # FRAME params, if any, end here
        planes += content[pos : pos + luma_len]
        pos += frame_len
        n_frames += 1
    return n_frames, width, height, bytes(planes)


def _decode_video(content: bytes) -> tuple[int, int, int, bytes]:
    """Format-sniffing decode: real y4m when the magic matches, SYNTH
    otherwise — one binary column carries both."""
    content = bytes(content)
    if content[: len(_Y4M_MAGIC)] == _Y4M_MAGIC:
        return decode_real_video(content)
    return _decode_synth_video(content)


# -- ISO BMFF (MPEG-4 Part 12) container metadata, pure stdlib ----------
#
# Compressed video DECODE genuinely needs a codec library the container
# lacks (pyav/ffmpeg) and stays a marked NotImplementedError. But the
# CONTAINER is just a length-prefixed box tree, so duration / dimensions /
# track count are stdlib-reachable: walk ftyp -> moov -> mvhd (timescale,
# duration) and trak -> tkhd (16.16 fixed-point width/height). That lets
# the pipeline degrade gracefully on real mp4/mov payloads — a metadata
# row instead of a crash — which is what a 100 TB media crawl needs when
# a shard mixes decodable and codec-only assets.


def _is_mp4(raw: bytes) -> bool:
    return len(raw) >= 12 and raw[4:8] == b"ftyp"


def _boxes(raw: bytes, start: int, end: int):
    """Yield (type, body_start, box_end) for each ISO BMFF box in
    [start, end); handles 64-bit largesize and size==0 (to-end) boxes."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(raw[pos : pos + 4], "big")
        btype = raw[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                break
            size = int.from_bytes(raw[pos + 8 : pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            break
        yield btype, pos + hdr, pos + size
        pos += size


def parse_mp4_metadata(content: bytes) -> dict:
    """Container-level metadata from an mp4/mov payload without a codec:
    {major_brand, duration_s, width, height, n_tracks}. width/height are
    the max over tracks (audio tracks carry 0x0 in tkhd). Raises
    NotImplementedError on non-BMFF bytes."""
    raw = bytes(content)
    if not _is_mp4(raw):
        raise NotImplementedError("not an ISO BMFF (mp4/mov) payload")
    meta: dict = {
        "major_brand": raw[8:12].decode("ascii", "replace").strip(),
        "duration_s": None,
        "width": 0,
        "height": 0,
        "n_tracks": 0,
    }
    for btype, s, e in _boxes(raw, 0, len(raw)):
        if btype != b"moov":
            continue
        for t2, s2, e2 in _boxes(raw, s, e):
            if t2 == b"mvhd" and e2 - s2 >= 20:
                ver = raw[s2]
                if ver == 1:
                    timescale = int.from_bytes(raw[s2 + 20 : s2 + 24], "big")
                    duration = int.from_bytes(raw[s2 + 24 : s2 + 32], "big")
                else:
                    timescale = int.from_bytes(raw[s2 + 12 : s2 + 16], "big")
                    duration = int.from_bytes(raw[s2 + 16 : s2 + 20], "big")
                if timescale:
                    meta["duration_s"] = duration / timescale
            elif t2 == b"trak":
                meta["n_tracks"] += 1
                for t3, s3, e3 in _boxes(raw, s2, e2):
                    if t3 != b"tkhd":
                        continue
                    off = s3 + (88 if raw[s3] == 1 else 76)
                    if off + 8 <= e3:
                        w = int.from_bytes(raw[off : off + 4], "big") >> 16
                        h = int.from_bytes(raw[off + 4 : off + 8], "big") >> 16
                        meta["width"] = max(meta["width"], w)
                        meta["height"] = max(meta["height"], h)
    return meta


def encode_minimal_mp4(
    width: int, height: int, duration_s: float, timescale: int = 1000
) -> bytes:
    """Minimal valid-enough ISO BMFF fixture (ftyp + moov{mvhd, trak{tkhd}}
    + empty mdat) for tests — a container with metadata but no decodable
    codec stream, exactly the shape that must degrade gracefully."""

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    unity = (
        struct.pack(">III", 0x00010000, 0, 0)
        + struct.pack(">III", 0, 0x00010000, 0)
        + struct.pack(">III", 0, 0, 0x40000000)
    )
    dur = int(round(duration_s * timescale))
    mvhd = box(
        b"mvhd",
        bytes(4)  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation, modification
        + struct.pack(">II", timescale, dur)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume 1.0
        + bytes(10)  # reserved
        + unity
        + bytes(24)  # pre_defined
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x03"  # version 0, flags: enabled|in_movie
        + struct.pack(">II", 0, 0)  # creation, modification
        + struct.pack(">II", 1, 0)  # track_ID, reserved
        + struct.pack(">I", dur)
        + bytes(8)  # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, alt_group, volume, reserved
        + unity
        + struct.pack(">II", width << 16, height << 16),
    )
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + box(b"moov", mvhd + box(b"trak", tkhd)) + box(b"mdat", bytes(8))


# -- Matroska/webm (EBML) container metadata, pure stdlib ---------------
#
# Same degrade-gracefully contract as mp4: the EBML tree is stdlib-
# walkable even though the codec payload is not. Elements are
# (vint id, vint size, payload); we descend only Segment -> Info
# (TimestampScale, Duration) and Tracks -> TrackEntry -> Video
# (PixelWidth/PixelHeight).

_EBML_MAGIC = b"\x1a\x45\xdf\xa3"


def _read_vint(raw: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """EBML variable-length integer at pos -> (value, next_pos). Element
    IDs keep the length-marker bit (matches spec notation); sizes strip it."""
    first = raw[pos]
    if first == 0:
        raise ValueError("invalid EBML vint")
    length = 8 - first.bit_length() + 1
    val = first if keep_marker else first & (0xFF >> length)
    for i in range(1, length):
        val = (val << 8) | raw[pos + i]
    return val, pos + length


def _ebml_children(raw: bytes, start: int, end: int):
    pos = start
    while pos < end:
        try:
            eid, p = _read_vint(raw, pos, keep_marker=True)
            size, body = _read_vint(raw, p, keep_marker=False)
        except (ValueError, IndexError):
            return
        # "unknown size" (all value bits set) => element runs to end
        stop = end if size == (1 << (7 * (body - p))) - 1 else min(end, body + size)
        yield eid, body, stop
        pos = stop


def parse_webm_metadata(content: bytes) -> dict:
    """{doc_type, duration_s, width, height, n_tracks} from a
    Matroska/webm payload without a codec. Raises NotImplementedError on
    non-EBML bytes."""
    raw = bytes(content)
    if raw[:4] != _EBML_MAGIC:
        raise NotImplementedError("not an EBML (webm/mkv) payload")
    meta: dict = {"doc_type": None, "duration_s": None, "width": 0, "height": 0, "n_tracks": 0}
    timestamp_scale, duration_ticks = 1_000_000, None  # EBML default: 1 ms
    for eid, s, e in _ebml_children(raw, 0, len(raw)):
        if eid == 0x1A45DFA3:  # EBML header
            for cid, cs, ce in _ebml_children(raw, s, e):
                if cid == 0x4282:  # DocType
                    meta["doc_type"] = raw[cs:ce].rstrip(b"\x00").decode("ascii", "replace")
        elif eid == 0x18538067:  # Segment
            for cid, cs, ce in _ebml_children(raw, s, e):
                if cid == 0x1549A966:  # Info
                    for iid, is_, ie in _ebml_children(raw, cs, ce):
                        if iid == 0x2AD7B1:  # TimestampScale (ns per tick)
                            timestamp_scale = int.from_bytes(raw[is_:ie], "big")
                        elif iid == 0x4489:  # Duration (float ticks)
                            # spec allows 4- or 8-byte floats ONLY; any
                            # other width is a malformed element — skip it
                            # rather than struct.error on hostile bytes
                            width_b = ie - is_
                            if width_b in (4, 8):
                                duration_ticks = struct.unpack(
                                    ">f" if width_b == 4 else ">d", raw[is_:ie]
                                )[0]
                elif cid == 0x1654AE6B:  # Tracks
                    for tid, ts, te in _ebml_children(raw, cs, ce):
                        if tid != 0xAE:  # TrackEntry
                            continue
                        meta["n_tracks"] += 1
                        for vid, vs, ve in _ebml_children(raw, ts, te):
                            if vid != 0xE0:  # Video
                                continue
                            for pid, ps, pe in _ebml_children(raw, vs, ve):
                                if pid == 0xB0:
                                    meta["width"] = max(
                                        meta["width"], int.from_bytes(raw[ps:pe], "big")
                                    )
                                elif pid == 0xBA:
                                    meta["height"] = max(
                                        meta["height"], int.from_bytes(raw[ps:pe], "big")
                                    )
    if duration_ticks is not None:
        meta["duration_s"] = duration_ticks * timestamp_scale / 1e9
    return meta


def encode_minimal_webm(width: int, height: int, duration_s: float) -> bytes:
    """Minimal EBML/webm fixture (header + Segment{Info, Tracks{TrackEntry
    {Video}}}) — container metadata, no codec stream; the test-fixture
    counterpart of encode_minimal_mp4."""

    def vint_size(n: int) -> bytes:  # 1-byte size marker when it fits
        if n < 0x7F:
            return bytes([0x80 | n])
        return bytes([0x40 | (n >> 8), n & 0xFF])  # 2-byte form

    def elem(eid: int, payload: bytes) -> bytes:
        eid_b = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
        return eid_b + vint_size(len(payload)) + payload

    header = elem(0x1A45DFA3, elem(0x4282, b"webm"))
    info = elem(
        0x1549A966,
        elem(0x2AD7B1, (1_000_000).to_bytes(3, "big"))
        + elem(0x4489, struct.pack(">d", duration_s * 1000.0)),
    )
    video = elem(0xE0, elem(0xB0, width.to_bytes(2, "big")) + elem(0xBA, height.to_bytes(2, "big")))
    tracks = elem(0x1654AE6B, elem(0xAE, video))
    return header + elem(0x18538067, info + tracks)


VIDEO_METADATA_SCHEMA = (
    "media_id long, container string, major_brand string, duration_s double, "
    "width int, height int, n_frames int, n_tracks int"
)


def video_container_metadata(media: DataFrame) -> DataFrame:
    """Format-sniffed container metadata for every video payload — mp4/mov
    (box walk, no codec), y4m and SYNTH (full header decode). The uniform
    row lets a crawl inventory mixed media before deciding what to decode;
    unknown formats yield a row with nulls rather than failing the shard."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        cols = (
            "media_id", "container", "major_brand", "duration_s",
            "width", "height", "n_frames", "n_tracks",
        )
        for pdf in batches:
            out: dict = {k: [] for k in cols}

            def emit(media_id, container, brand=None, dur=None, w=None, h=None, nf=None, nt=None):
                for k, v in zip(cols, (media_id, container, brand, dur, w, h, nf, nt)):
                    out[k].append(v)

            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                raw = bytes(content)
                # every parse is guarded: a magic match does not make the
                # rest of the payload well-formed, and a malformed container
                # must audit as "unknown", never fail the task
                if _is_mp4(raw):
                    try:
                        m = parse_mp4_metadata(raw)
                        emit(media_id, "mp4", m["major_brand"], m["duration_s"],
                             m["width"], m["height"], None, m["n_tracks"])
                    except Exception:
                        emit(media_id, "unknown")
                elif raw[:4] == _EBML_MAGIC:
                    try:
                        m = parse_webm_metadata(raw)
                        emit(media_id, m["doc_type"] or "webm", m["doc_type"],
                             m["duration_s"], m["width"], m["height"], None, m["n_tracks"])
                    except Exception:
                        emit(media_id, "unknown")
                elif raw[: len(_Y4M_MAGIC)] == _Y4M_MAGIC:
                    try:
                        nf, w, h, _ = decode_real_video(raw)
                        emit(media_id, "y4m", None, None, w, h, nf, 1)
                    except Exception:
                        emit(media_id, "unknown")
                elif len(raw) >= 12:
                    try:
                        nf, w, h, px = _decode_synth_video(raw)
                        # a SYNTH header must account for the payload
                        # exactly — anything else is foreign bytes
                        if w <= 0 or h <= 0 or nf < 0 or len(px) != nf * w * h:
                            raise ValueError("not a SYNTH payload")
                        emit(media_id, "synth", None, None, w, h, nf, 1)
                    except Exception:
                        emit(media_id, "unknown")
                else:
                    emit(media_id, "unknown")
            yield pd.DataFrame(out)

    return media.filter(F.col("media_type") == "video").select("media_id", "content").mapInPandas(
        extract, VIDEO_METADATA_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_samples long, duration_s double, rms double, "
    "peak int, zero_crossings long"
)

# SYNTH audio: 4-byte big-endian sample rate, then signed 16-bit PCM mono.


def encode_synth_audio(sample_rate: int, samples: list[int]) -> bytes:
    import struct as _struct

    return _struct.pack(">I", sample_rate) + b"".join(
        _struct.pack(">h", s) for s in samples
    )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Waveform feature extraction over a binary audio column: RMS, peak,
    zero-crossing rate, duration. Same Arrow-batched shape as images; a
    real deployment swaps the SYNTH decode for soundfile/librosa (not in
    this container — decode_real_audio below is the marked stub)."""

    def features(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("media_id", "n_samples", "duration_s", "rms", "peak", "zero_crossings")}
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None or len(content) < 4:
                    continue
                raw = bytes(content)
                try:
                    if raw[:4] == b"RIFF":
                        rate, pcm16 = decode_real_audio(raw)
                        pcm = pcm16.astype(np.float64)
                    elif raw[:4] == _FLAC_MAGIC:
                        rate, pcm16 = decode_real_flac(raw)
                        pcm = pcm16.astype(np.float64)
                    else:
                        rate = struct.unpack(">I", raw[:4])[0]
                        if rate <= 0 or len(raw[4:]) % 2:
                            raise NotImplementedError("not a SYNTH audio payload")
                        pcm = np.frombuffer(raw[4:], dtype=">i2").astype(np.float64)
                except Exception:
                    continue  # undecodable cell: skip, don't kill the shard
                out["media_id"].append(media_id)
                out["n_samples"].append(len(pcm))
                out["duration_s"].append(len(pcm) / rate if rate else 0.0)
                out["rms"].append(float(np.sqrt((pcm * pcm).mean())) if len(pcm) else 0.0)
                out["peak"].append(int(np.abs(pcm).max()) if len(pcm) else 0)
                out["zero_crossings"].append(int((np.diff(np.signbit(pcm)) != 0).sum()) if len(pcm) > 1 else 0)
            yield pd.DataFrame(out)

    return media.filter(F.col("media_type") == "audio").select("media_id", "content").mapInPandas(
        features, AUDIO_FEATURES_SCHEMA
    )


def encode_wav(sample_rate: int, samples: list[int], channels: int = 1) -> bytes:
    """Real RIFF/WAVE encoder (16-bit PCM) via the stdlib wave module."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def parse_wav_metadata(content: bytes) -> dict:
    """Container-level WAV metadata straight from the RIFF/WAVE header —
    channel count and frame count as the CONTAINER declares them, with no
    downmix (decode_real_audio averages multichannel to mono, so its
    outputs describe the decode contract, not the container)."""
    import io
    import wave

    raw = bytes(content)
    if raw[:4] != b"RIFF":
        raise NotImplementedError("not a RIFF/WAVE payload")
    with wave.open(io.BytesIO(raw), "rb") as wf:
        rate = wf.getframerate()
        channels = wf.getnchannels()
        bits = wf.getsampwidth() * 8
        n_frames = wf.getnframes()
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits_per_sample": bits,
        "n_samples": n_frames,
        "duration_s": n_frames / rate if rate else None,
        "codec": "pcm_s16" if bits == 16 else f"pcm_s{bits}",
    }


def decode_real_audio(content: bytes):
    """REAL RIFF/WAVE decode on the stdlib wave module: 16-bit PCM, any
    channel count (multichannel is averaged to mono so every payload lands
    in the same (rate, int16 mono) contract as SYNTH). Raises
    NotImplementedError for non-RIFF bytes or non-16-bit sample widths."""
    import io
    import wave

    import numpy as np

    raw = bytes(content)
    if raw[:4] != b"RIFF":
        raise NotImplementedError("not a RIFF/WAVE payload (and not SYNTH)")
    with wave.open(io.BytesIO(raw), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError("WAV subset: 16-bit PCM only")
        rate = wf.getframerate()
        channels = wf.getnchannels()
        pcm = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
    if channels > 1:
        pcm = pcm.reshape(-1, channels).mean(axis=1).round().astype(np.int16)
    return rate, pcm


# -- Audio container metadata without codecs ----------------------------
#
# The audio parallel of the mp4/webm/JPEG container walks: a real crawl
# shard mixes WAV with FLAC/MP3/OGG, whose entropy decode needs a codec
# library this container does not have — but their CONTAINER metadata
# (sample rate, channels, bit depth, duration) is pure header structure,
# parseable with stdlib ints. Reference parity note: the reference
# pipeline has no media handling at all; this family exists for the
# training-data curation surface (inventory before deciding what to
# transcode). Every parser raises NotImplementedError on foreign bytes
# and is wrapped per-cell by audio_container_metadata.

_FLAC_MAGIC = b"fLaC"
_ID3_MAGIC = b"ID3"
_OGG_MAGIC = b"OggS"


def parse_flac_metadata(content: bytes) -> dict:
    """STREAMINFO (the mandatory first metadata block): sample rate,
    channels, bits per sample, total samples -> duration. No frame
    decode."""
    raw = bytes(content)
    if raw[:4] != _FLAC_MAGIC:
        raise NotImplementedError("not a FLAC payload")
    if len(raw) < 8 + 34:
        raise NotImplementedError("FLAC payload truncated before STREAMINFO")
    block_type = raw[4] & 0x7F
    block_len = int.from_bytes(raw[5:8], "big")
    if block_type != 0 or block_len < 34:
        raise NotImplementedError("FLAC: first metadata block is not STREAMINFO")
    si = raw[8 : 8 + 34]
    # bits 80..99 sample rate, 100..102 channels-1, 103..107 bps-1,
    # 108..143 total samples (big-endian bit offsets from block start)
    word = int.from_bytes(si[10:18], "big")  # bytes 10..17 = bits 80..143
    sample_rate = (word >> 44) & 0xFFFFF
    channels = ((word >> 41) & 0x7) + 1
    bits_per_sample = ((word >> 36) & 0x1F) + 1
    total_samples = word & 0xFFFFFFFFF
    if sample_rate == 0:
        raise NotImplementedError("FLAC: zero sample rate")
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bits_per_sample": bits_per_sample,
        "n_samples": total_samples,
        "duration_s": total_samples / sample_rate,
        "codec": "flac",
    }


# -- FLAC sample decode (stdlib-only) -----------------------------------
#
# The one compressed audio format whose entropy layer is stdlib-feasible:
# rice-coded prediction residuals, no transform. This closes the "parse
# the container, stub the samples" gap for the dominant lossless format:
# decode_real_flac returns actual PCM (same (rate, int16 mono) contract
# as decode_real_audio), covering every subframe type the spec defines —
# CONSTANT, VERBATIM, FIXED orders 0-4, LPC any order — rice partitions
# (both 4- and 5-bit parameter widths, escape-to-raw partitions), wasted
# bits, and all four channel assignments (independent, left/side,
# right/side, mid/side). CRCs are not verified (inventory decode, not
# playback); every parse loop strictly advances, so truncated or
# corrupted bytes raise instead of hanging (fuzz-pinned).


class _FlacBitReader:
    """Plain MSB-first bit reader (no byte stuffing — that's JPEG's)."""

    def __init__(self, raw: bytes, pos: int):
        self.raw, self.pos, self.acc, self.n = raw, pos, 0, 0

    def bit(self) -> int:
        if self.n == 0:
            self.acc = self.raw[self.pos]  # IndexError at EOF -> caller's
            self.pos += 1  # per-cell handler; never an infinite loop
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sbits(self, k: int) -> int:
        v = self.bits(k)
        return v - (1 << k) if k and v >= (1 << (k - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bit() == 0:
            q += 1
        return q

    def align(self) -> None:
        self.n = 0


_FLAC_SR_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _flac_coded_number(r: "_FlacBitReader") -> int:
    """The UTF-8-style frame/sample number (up to 36 bits, 7 bytes)."""
    b0 = r.bits(8)
    if b0 < 0x80:
        return b0
    n_follow = 0
    mask = 0x40
    while b0 & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise NotImplementedError("FLAC: invalid coded number")
    v = b0 & (mask - 1)
    for _ in range(n_follow):
        c = r.bits(8)
        if (c & 0xC0) != 0x80:
            raise NotImplementedError("FLAC: invalid coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _flac_residuals(r: "_FlacBitReader", blocksize: int, order: int) -> list[int]:
    method = r.bits(2)
    if method > 1:
        raise NotImplementedError("FLAC: reserved residual coding method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    po = r.bits(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise NotImplementedError("FLAC: partition order does not divide blocksize")
    out: list[int] = []
    for p in range(nparts):
        n = (blocksize >> po) - (order if p == 0 else 0)
        if n < 0:
            raise NotImplementedError("FLAC: predictor order exceeds first partition")
        param = r.bits(pbits)
        if param == escape:
            w = r.bits(5)
            out.extend(r.sbits(w) if w else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = r.unary()
                u = (q << param) | r.bits(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


_FLAC_FIXED_COEFS = ((), (1,), (2, -1), (3, -3, 1), (4, -6, 4, -1))


def _flac_subframe(r: "_FlacBitReader", blocksize: int, bps: int) -> list[int]:
    if r.bit() != 0:
        raise NotImplementedError("FLAC: subframe padding bit set")
    t = r.bits(6)
    wasted = 0
    if r.bit():
        wasted = 1 + r.unary()
    eff = bps - wasted
    if eff <= 0:
        raise NotImplementedError("FLAC: wasted bits exceed sample size")
    if t == 0:  # CONSTANT
        out = [r.sbits(eff)] * blocksize
    elif t == 1:  # VERBATIM
        out = [r.sbits(eff) for _ in range(blocksize)]
    elif 8 <= t <= 12:  # FIXED, order t-8
        order = t - 8
        out = [r.sbits(eff) for _ in range(order)]
        coefs = _FLAC_FIXED_COEFS[order]
        for res in _flac_residuals(r, blocksize, order):
            out.append(res + sum(c * out[-1 - j] for j, c in enumerate(coefs)))
    elif t >= 32:  # LPC, order t-31
        order = t - 31
        out = [r.sbits(eff) for _ in range(order)]
        prec = r.bits(4) + 1
        if prec == 16:
            raise NotImplementedError("FLAC: invalid LPC precision escape")
        shift = r.sbits(5)
        if shift < 0:
            raise NotImplementedError("FLAC: negative LPC shift")
        coefs = [r.sbits(prec) for _ in range(order)]
        for res in _flac_residuals(r, blocksize, order):
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs)) >> shift
            out.append(res + pred)
    else:
        raise NotImplementedError("FLAC: reserved subframe type")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_real_flac(content: bytes):
    """REAL FLAC sample decode: (rate, int16 mono) — same contract as
    decode_real_audio (multichannel averages to mono). 16-bit streams
    only; raises NotImplementedError on foreign/truncated bytes."""
    import numpy as np

    raw = bytes(content)
    info = parse_flac_metadata(raw)  # validates magic + STREAMINFO
    if info["bits_per_sample"] != 16:
        raise NotImplementedError("FLAC subset: 16-bit streams only")
    rate, n_ch = info["sample_rate"], info["channels"]

    # walk the metadata blocks to the first audio frame
    pos = 4
    while True:
        if pos + 4 > len(raw):
            raise NotImplementedError("FLAC: truncated metadata")
        last = raw[pos] & 0x80
        block_len = int.from_bytes(raw[pos + 1 : pos + 4], "big")
        pos += 4 + block_len
        if last:
            break

    chans: list[list[int]] = [[] for _ in range(n_ch)]
    while pos < len(raw):
        if pos + 2 > len(raw):
            raise NotImplementedError("FLAC: trailing bytes are not a frame")
        if raw[pos] != 0xFF or (raw[pos + 1] & 0xFC) != 0xF8:
            raise NotImplementedError("FLAC: lost frame sync")
        r = _FlacBitReader(raw, pos)
        r.bits(16)  # sync + reserved + blocking strategy
        bs_code = r.bits(4)
        sr_code = r.bits(4)
        chan_code = r.bits(4)
        size_code = r.bits(3)
        r.bit()  # reserved
        _flac_coded_number(r)
        if bs_code == 0:
            raise NotImplementedError("FLAC: reserved block size code")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = r.bits(8) + 1
        elif bs_code == 7:
            blocksize = r.bits(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 12:
            r.bits(8)
        elif sr_code in (13, 14):
            r.bits(16)
        elif sr_code == 15:
            raise NotImplementedError("FLAC: invalid sample rate code")
        if size_code == 0:
            bps = 16  # from STREAMINFO (validated above)
        else:
            bps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(size_code)
            if bps is None:
                raise NotImplementedError("FLAC: reserved sample size code")
            if bps != 16:
                raise NotImplementedError("FLAC subset: 16-bit streams only")
        r.bits(8)  # header CRC-8 (unverified)

        if chan_code < 8:
            if chan_code + 1 != n_ch:
                raise NotImplementedError("FLAC: channel count mismatch")
            subs = [_flac_subframe(r, blocksize, bps) for _ in range(n_ch)]
        elif chan_code in (8, 9, 10):
            if n_ch != 2:
                raise NotImplementedError("FLAC: stereo assignment on non-stereo stream")
            # the SIDE channel carries one extra bit
            bps_a = bps + (1 if chan_code == 9 else 0)
            bps_b = bps + (1 if chan_code in (8, 10) else 0)
            a = _flac_subframe(r, blocksize, bps_a)
            b = _flac_subframe(r, blocksize, bps_b)
            if chan_code == 8:  # left/side: R = L - side
                subs = [a, [x - s for x, s in zip(a, b)]]
            elif chan_code == 9:  # right/side: L = R + side
                subs = [[x + s for x, s in zip(b, a)], b]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(a, b):
                    mm = (m << 1) | (s & 1)
                    left.append((mm + s) >> 1)
                    right.append((mm - s) >> 1)
                subs = [left, right]
        else:
            raise NotImplementedError("FLAC: reserved channel assignment")
        r.align()
        r.pos += 2  # frame CRC-16 (unverified)
        if r.pos <= pos:
            raise NotImplementedError("FLAC: frame did not advance")
        pos = r.pos
        for c in range(n_ch):
            chans[c].extend(subs[c])

    total = info["n_samples"]
    if total and any(len(c) < total for c in chans):
        raise NotImplementedError("FLAC: stream shorter than STREAMINFO declares")
    pcm = np.array([c[:total] if total else c for c in chans], dtype=np.int64)
    if n_ch > 1:
        pcm = pcm.mean(axis=0).round()
    else:
        pcm = pcm[0]
    return rate, pcm.astype(np.int16)


class _FlacBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc, self.n = 0, 0

    def add(self, value: int, k: int) -> None:
        for i in range(k - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc, self.n = 0, 0

    def add_signed(self, value: int, k: int) -> None:
        self.add(value & ((1 << k) - 1), k)

    def align(self) -> None:
        if self.n:
            self.add(0, 8 - self.n)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16_flac(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _rice_cost(residuals: list[int], param: int) -> int:
    cost = 0
    for v in residuals:
        u = (v << 1) ^ (v >> 63)
        cost += (u >> param) + 1 + param
    return cost


def _encode_subframe(w: "_FlacBitWriter", samples: list[int], bps: int) -> None:
    n = len(samples)
    if all(s == samples[0] for s in samples):
        w.add(0, 1); w.add(0, 6); w.add(0, 1)  # CONSTANT
        w.add_signed(samples[0], bps)
        return
    # best fixed order 0-2 by absolute residual sum, vs verbatim
    best = None
    for order in range(3):
        if n <= order:
            break
        res = list(samples[:order])
        coefs = _FLAC_FIXED_COEFS[order]
        resid = [
            samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, n)
        ]
        param = min(range(15), key=lambda p: _rice_cost(resid, p))
        cost = order * bps + 2 + 4 + 4 + _rice_cost(resid, param)
        if best is None or cost < best[0]:
            best = (cost, order, resid, param)
    if best is None or best[0] >= n * bps:
        w.add(0, 1); w.add(1, 6); w.add(0, 1)  # VERBATIM
        for s in samples:
            w.add_signed(s, bps)
        return
    _, order, resid, param = best
    w.add(0, 1); w.add(8 + order, 6); w.add(0, 1)  # FIXED
    for s in samples[:order]:
        w.add_signed(s, bps)
    w.add(0, 2)  # rice method 0 (4-bit params)
    w.add(0, 4)  # partition order 0
    w.add(param, 4)
    for v in resid:
        u = (v << 1) ^ (v >> 63)
        w.add(0, u >> param)
        w.add(1, 1)
        w.add(u & ((1 << param) - 1), param)


def encode_flac(
    sample_rate: int,
    samples: list[int],
    channels: int = 1,
    *,
    block_size: int = 4096,
    stereo_mode: str = "independent",
) -> bytes:
    """Real FLAC encoder (16-bit): STREAMINFO + audio frames with valid
    CRCs. Subframes pick CONSTANT / FIXED(0-2)+rice / VERBATIM per block;
    ``stereo_mode`` ∈ {independent, left_side, right_side, mid_side}
    exercises every channel-assignment reconstruction in the decoder.
    ``samples`` is interleaved when channels > 1 (like encode_wav)."""
    if len(samples) % max(channels, 1):
        raise ValueError("interleaved sample count must divide by channels")
    n_frames_total = len(samples) // channels
    head = encode_minimal_flac(sample_rate, channels, 16, n_frames_total)
    # deinterleave
    chans = [list(samples[c::channels]) for c in range(channels)]
    out = bytearray(head)
    frame_idx = 0
    for start in range(0, n_frames_total, block_size):
        blk = [c[start : start + block_size] for c in chans]
        bs = len(blk[0])
        w = _FlacBitWriter()
        w.add(0b1111_1111_1111_10, 14)  # sync
        w.add(0, 1)  # reserved
        w.add(0, 1)  # fixed-blocksize stream
        w.add(7, 4)  # blocksize: 16-bit at end of header
        w.add(0, 4)  # sample rate: from STREAMINFO
        if channels == 2 and stereo_mode != "independent":
            code = {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode]
        elif channels == 2 and stereo_mode == "independent":
            code = 1
        elif stereo_mode != "independent":
            raise ValueError("stereo_mode requires channels=2")
        else:
            code = channels - 1
        w.add(code, 4)
        w.add(4, 3)  # sample size: 16-bit
        w.add(0, 1)  # reserved
        # coded frame number (frame_idx < 2^31 fits the UTF-8 scheme)
        i = frame_idx
        if i < 0x80:
            w.add(i, 8)
        elif i < 0x800:
            w.add(0xC0 | (i >> 6), 8)
            w.add(0x80 | (i & 0x3F), 8)
        else:
            raise ValueError("encode_flac fixture: too many frames")
        w.add(bs - 1, 16)
        w.align()
        header = bytes(w.buf)
        w.add(_crc8(header), 8)
        if code == 8:  # left/side
            side = [l - r for l, r in zip(blk[0], blk[1])]
            _encode_subframe(w, blk[0], 16)
            _encode_subframe(w, side, 17)
        elif code == 9:  # right/side
            side = [l - r for l, r in zip(blk[0], blk[1])]
            _encode_subframe(w, side, 17)
            _encode_subframe(w, blk[1], 16)
        elif code == 10:  # mid/side
            mid = [(l + r) >> 1 for l, r in zip(blk[0], blk[1])]
            side = [l - r for l, r in zip(blk[0], blk[1])]
            _encode_subframe(w, mid, 16)
            _encode_subframe(w, side, 17)
        else:
            for c in range(channels):
                _encode_subframe(w, blk[c], 16)
        w.align()
        frame = bytes(w.buf)
        w.add(_crc16_flac(frame), 16)
        out += bytes(w.buf)
        frame_idx += 1
    return bytes(out)


_MP3_BITRATES_V1_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_BITRATES_V2_L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
_MP3_RATES_V1 = (44100, 48000, 32000)


def _mp3_frame(raw: bytes, pos: int):
    """(frame_length, samples_per_frame, sample_rate) of the Layer III
    frame at ``pos``, or None if the bytes there are not a valid header."""
    if pos + 4 > len(raw):
        return None
    h = int.from_bytes(raw[pos : pos + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version = (h >> 19) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (h >> 17) & 0x3  # 1 = Layer III
    bitrate_idx = (h >> 12) & 0xF
    rate_idx = (h >> 10) & 0x3
    padding = (h >> 9) & 0x1
    if version == 1 or layer != 1 or bitrate_idx in (0, 15) or rate_idx == 3:
        return None
    if version == 3:
        bitrate = _MP3_BITRATES_V1_L3[bitrate_idx] * 1000
        rate = _MP3_RATES_V1[rate_idx]
        samples = 1152
    else:
        bitrate = _MP3_BITRATES_V2_L3[bitrate_idx] * 1000
        rate = _MP3_RATES_V1[rate_idx] // (2 if version == 2 else 4)
        samples = 576
    frame_len = samples // 8 * bitrate // rate + padding
    if frame_len <= 4:
        return None
    return frame_len, samples, rate


def parse_mp3_metadata(content: bytes) -> dict:
    """Frame-walk duration for MPEG-1/2/2.5 Layer III: skip any ID3v2 tag
    (syncsafe length), find the first frame sync, then walk EVERY frame
    header summing samples/rate — exact for CBR and VBR alike, no Xing
    header trusted, no entropy decode."""
    raw = bytes(content)
    pos = 0
    if raw[:3] == _ID3_MAGIC and len(raw) >= 10:
        size = 0
        for b in raw[6:10]:  # syncsafe: 7 bits per byte
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    first = None
    scan_limit = min(len(raw), pos + 4096)  # sync must appear near the tag end
    while pos + 4 <= scan_limit:
        if _mp3_frame(raw, pos):
            first = pos
            break
        pos += 1
    if first is None:
        raise NotImplementedError("not an MPEG Layer III payload")
    n_frames, duration, rate = 0, 0.0, None
    pos = first
    while True:
        fr = _mp3_frame(raw, pos)
        if fr is None or pos + fr[0] > len(raw):
            break
        frame_len, samples, rate = fr
        n_frames += 1
        duration += samples / rate
        pos += frame_len
    if n_frames == 0:
        raise NotImplementedError("MP3: no complete frames")
    return {
        "sample_rate": rate,
        "channels": None,  # mode field varies per frame; not inventoried
        "bits_per_sample": None,  # lossy codec: no PCM width in container
        "n_samples": None,
        "duration_s": duration,
        "codec": "mp3",
        "n_frames": n_frames,
    }


def parse_ogg_metadata(content: bytes) -> dict:
    """Ogg page walk: identification header on the first page (Vorbis or
    Opus) for rate/channels, final page's granule position for duration.
    CRCs are not verified — this is an inventory pass, not playback."""
    raw = bytes(content)
    if raw[:4] != _OGG_MAGIC:
        raise NotImplementedError("not an Ogg payload")
    pos, codec, rate, channels, last_granule = 0, None, None, None, 0
    granule_rate = None  # opus granules tick at 48 kHz regardless of rate
    while pos + 27 <= len(raw):
        if raw[pos : pos + 4] != _OGG_MAGIC:
            break
        granule = int.from_bytes(raw[pos + 6 : pos + 14], "little", signed=True)
        n_segs = raw[pos + 26]
        seg_table = raw[pos + 27 : pos + 27 + n_segs]
        if len(seg_table) < n_segs:
            break
        body_len = sum(seg_table)
        body = raw[pos + 27 + n_segs : pos + 27 + n_segs + body_len]
        if codec is None:
            if body[:7] == b"\x01vorbis" and len(body) >= 16:
                codec = "vorbis"
                channels = body[11]
                rate = int.from_bytes(body[12:16], "little")
                granule_rate = rate
            # the full OpusHead identification header is 19 bytes; a
            # shorter slice would let int.from_bytes silently read a
            # truncated (bogus) sample rate from body[12:16]
            elif body[:8] == b"OpusHead" and len(body) >= 19:
                codec = "opus"
                channels = body[9]
                rate = int.from_bytes(body[12:16], "little")
                granule_rate = 48000
        if granule > 0:
            last_granule = granule
        pos += 27 + n_segs + body_len
    if codec is None or not rate:
        raise NotImplementedError("Ogg: no Vorbis/Opus identification header")
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits_per_sample": None,
        "n_samples": last_granule if granule_rate == rate else None,
        "duration_s": last_granule / granule_rate if granule_rate else None,
        "codec": codec,
    }


AUDIO_METADATA_SCHEMA = (
    "media_id long, container string, codec string, sample_rate int, "
    "channels int, bits_per_sample int, n_samples long, duration_s double"
)


def audio_container_metadata(media: DataFrame) -> DataFrame:
    """Format-sniffed container metadata for every audio payload — WAV,
    SYNTH and FLAC decode fully (FLAC samples via decode_real_flac;
    this inventory pass reads only its STREAMINFO); MP3/OGG parse header
    structure only (codec-level decode of transform codecs is the marked
    stub). Mirrors video_container_metadata:
    one row per payload, unknown formats audit as 'unknown', malformed
    magic-matching bytes never fail the shard."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        cols = (
            "media_id", "container", "codec", "sample_rate",
            "channels", "bits_per_sample", "n_samples", "duration_s",
        )
        for pdf in batches:
            out: dict = {k: [] for k in cols}

            def emit(media_id, container, codec=None, rate=None, ch=None,
                     bps=None, ns=None, dur=None):
                for k, v in zip(cols, (media_id, container, codec, rate, ch, bps, ns, dur)):
                    out[k].append(v)

            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                raw = bytes(content)
                try:
                    if raw[:4] == b"RIFF":
                        # container truth comes from the WAV header, not
                        # decode_real_audio (which downmixes to mono and
                        # would misreport a stereo payload's channels)
                        m = parse_wav_metadata(raw)
                        emit(media_id, "wav", m["codec"], m["sample_rate"],
                             m["channels"], m["bits_per_sample"],
                             m["n_samples"], m["duration_s"])
                    elif raw[:4] == _FLAC_MAGIC:
                        m = parse_flac_metadata(raw)
                        emit(media_id, "flac", m["codec"], m["sample_rate"],
                             m["channels"], m["bits_per_sample"],
                             m["n_samples"], m["duration_s"])
                    elif raw[:4] == _OGG_MAGIC:
                        m = parse_ogg_metadata(raw)
                        emit(media_id, "ogg", m["codec"], m["sample_rate"],
                             m["channels"], None, m["n_samples"], m["duration_s"])
                    elif raw[:3] == _ID3_MAGIC or (
                        len(raw) >= 2 and raw[0] == 0xFF and (raw[1] & 0xE0) == 0xE0
                    ):
                        m = parse_mp3_metadata(raw)
                        emit(media_id, "mp3", m["codec"], m["sample_rate"],
                             None, None, None, m["duration_s"])
                    elif len(raw) >= 4:
                        rate = struct.unpack(">I", raw[:4])[0]
                        if rate <= 0 or len(raw[4:]) % 2:
                            raise NotImplementedError("not a SYNTH audio payload")
                        n = len(raw[4:]) // 2
                        emit(media_id, "synth", "pcm_s16", rate, 1, 16,
                             n, n / rate)
                    else:
                        emit(media_id, "unknown")
                except Exception:
                    emit(media_id, "unknown")
            yield pd.DataFrame(out)

    return media.filter(F.col("media_type") == "audio").select("media_id", "content").mapInPandas(
        extract, AUDIO_METADATA_SCHEMA
    )


def encode_minimal_flac(
    sample_rate: int, channels: int, bits_per_sample: int, n_samples: int
) -> bytes:
    """FLAC fixture: magic + a valid last-flag STREAMINFO block (no audio
    frames) — exactly the structure parse_flac_metadata reads."""
    word = (
        (sample_rate & 0xFFFFF) << 44
        | ((channels - 1) & 0x7) << 41
        | ((bits_per_sample - 1) & 0x1F) << 36
        | (n_samples & 0xFFFFFFFFF)
    )
    si = (
        (4096).to_bytes(2, "big")  # min/max blocksize
        + (4096).to_bytes(2, "big")
        + (0).to_bytes(3, "big")  # min/max framesize (0 = unknown)
        + (0).to_bytes(3, "big")
        + word.to_bytes(8, "big")
        + b"\x00" * 16  # md5 of unencoded audio (unset)
    )
    return _FLAC_MAGIC + bytes([0x80]) + (34).to_bytes(3, "big") + si


def encode_minimal_mp3(
    n_frames: int, bitrate_kbps: int = 128, sample_rate: int = 44100, id3: bool = False
) -> bytes:
    """MP3 fixture: ``n_frames`` valid MPEG-1 Layer III CBR frame headers
    with zeroed payloads (no entropy data), optionally behind an ID3v2
    tag — duration is exactly n_frames * 1152 / sample_rate."""
    bitrate_idx = _MP3_BITRATES_V1_L3.index(bitrate_kbps)
    rate_idx = _MP3_RATES_V1.index(sample_rate)
    header = (
        0x7FF << 21 | 0x3 << 19 | 0x1 << 17 | 0x1 << 16  # sync, MPEG1, L3, no CRC
        | bitrate_idx << 12 | rate_idx << 10
    ).to_bytes(4, "big")
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    frame = header + b"\x00" * (frame_len - 4)
    tag = b""
    if id3:
        body = b"\x00" * 100
        size = len(body)
        syncsafe = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        tag = _ID3_MAGIC + b"\x04\x00\x00" + syncsafe + body
    return tag + frame * n_frames


def encode_minimal_ogg_opus(channels: int, input_rate: int, n_samples_48k: int) -> bytes:
    """Ogg/Opus fixture: an identification-header page plus one data page
    whose granule position encodes the stream length at 48 kHz."""

    def page(seq: int, granule: int, body: bytes, header_type: int) -> bytes:
        # 255-byte lacing segments + remainder (valid for body < 64 kB)
        segs = [255] * (len(body) // 255) + [len(body) % 255]
        return (
            _OGG_MAGIC
            + bytes([0, header_type])
            + granule.to_bytes(8, "little", signed=True)
            + (1).to_bytes(4, "little")  # serial
            + seq.to_bytes(4, "little")
            + (0).to_bytes(4, "little")  # crc unverified by the parser
            + bytes([len(segs)])
            + bytes(segs)
            + body
        )

    head = (
        b"OpusHead"
        + bytes([1, channels])  # version, channel count
        + (312).to_bytes(2, "little")  # pre-skip
        + input_rate.to_bytes(4, "little")
        + (0).to_bytes(2, "little")  # output gain
        + bytes([0])  # channel mapping family
    )
    return page(0, 0, head, 0x02) + page(1, n_samples_48k, b"\x00" * 20, 0x04)
