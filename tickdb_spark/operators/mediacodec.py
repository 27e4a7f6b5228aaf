"""Pure-numpy codecs for three public media container formats.

No PIL / opencv / ffmpeg in this container, so the decode kernels are
written against the public format specs directly:

* **BMP** (Windows bitmap, 24-bit uncompressed ``BI_RGB``): 14-byte file
  header + 40-byte ``BITMAPINFOHEADER``; pixel rows are BGR byte triples,
  each row zero-padded to a 4-byte boundary, stored bottom-up.
* **WAV** (RIFF PCM): ``RIFF``/``WAVE`` container, ``fmt `` chunk
  (format 1 = integer PCM, 16-bit), ``data`` chunk of little-endian
  interleaved int16 samples.
* **Y4M** (YUV4MPEG2): ASCII header line ``YUV4MPEG2 W<w> H<h>
  F<num>:<den> ... [C<fmt>]`` followed by ``FRAME\\n`` + raw planes per
  frame (``C444``: three w*h planes; ``C420``: Y then two quarter-size
  chroma planes).

Encoders exist so tests and gate queries can PLANT deterministic assets
whose decoded statistics have closed forms an SQL oracle can reproduce;
decoders never see anything but the bytes. Everything is vectorized
numpy — these run inside Arrow-batched ``mapInPandas`` bodies, so per-call
Python overhead is amortized over whole record batches.

Parity target: the reference treats media as opaque blobs; these kernels
are the extension SURVEY.md §2 declares for multimodal pipelines (decode /
feature-extract / frame-sample), with the Spark-side plumbing in
``operators/multimodal.py``.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# --------------------------------------------------------------------------


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BI_RGB BMP."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {rgb.shape}")
    h, w, _ = rgb.shape
    row_len = (w * 3 + 3) & ~3  # rows padded to 4-byte boundary
    rows = np.zeros((h, row_len), dtype=np.uint8)
    # BGR byte order, bottom-up row order
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
    pix = rows.tobytes()
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(pix), 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + pix


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into an (h, w, 3) uint8 RGB array.

    Handles the parts naive parsers get wrong: the pixel-data offset from
    the file header (palettes/extra headers may precede the pixels), the
    per-row 4-byte padding, bottom-up row order, and BGR channel order.
    """
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    (_, _, _, _, offset) = struct.unpack_from("<2sIHHI", data, 0)
    (hsize, w, h, planes, bpp, comp) = struct.unpack_from("<IiiHHI", data, 14)
    if hsize < 40 or planes != 1:
        raise ValueError(f"unsupported BMP header (size={hsize}, planes={planes})")
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    end = offset + row_len * h
    if end > len(data):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data[offset:end], dtype=np.uint8).reshape(h, row_len)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if bottom_up else img


# --------------------------------------------------------------------------
# PNG (8-bit greyscale / RGB / RGBA, non-interlaced)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: color type -> channels
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9.4): nearest of left/up/up-left to
    a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(img: np.ndarray, filters=None) -> bytes:
    """Encode an (h, w) grey, (h, w, 3) RGB or (h, w, 4) RGBA uint8 array
    as a non-interlaced 8-bit PNG (stdlib zlib deflate).

    ``filters`` picks the per-row filter type: an int applies one type to
    every row; ``None`` cycles 0..4 by row index so a planted asset
    exercises every unfilter path in one image."""
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    bpp = ch  # bytes per pixel at bit depth 8
    raw = img.astype(np.int16)  # room for the mod-256 differences
    lines = []
    prev = np.zeros((w, ch), dtype=np.int16)
    for y in range(h):
        f = (y % 5) if filters is None else int(filters)
        cur = raw[y]
        if f == 0:
            out = cur
        elif f == 1:  # Sub
            left = np.vstack([np.zeros((1, ch), np.int16), cur[:-1]])
            out = cur - left
        elif f == 2:  # Up
            out = cur - prev
        elif f == 3:  # Average
            left = np.vstack([np.zeros((1, ch), np.int16), cur[:-1]])
            out = cur - (left + prev) // 2
        elif f == 4:  # Paeth
            out = cur.copy()
            for x in range(w):
                for c in range(ch):
                    a = int(cur[x - 1, c]) if x else 0
                    b = int(prev[x, c])
                    cc = int(prev[x - 1, c]) if x else 0
                    out[x, c] = int(cur[x, c]) - _paeth(a, b, cc)
        else:
            raise ValueError(f"bad filter type {f}")
        lines.append(bytes([f]) + (out % 256).astype(np.uint8).tobytes())
        prev = cur
    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (grey / RGB / RGBA) into an
    (h, w, channels) uint8 array.

    Pure stdlib-zlib + numpy: walks the chunk list (length + type + CRC
    framing, IDAT may be split across chunks), inflates, and reverses the
    five per-row filter types. None/Sub/Up rows are vectorized (Sub is a
    mod-256 prefix sum along the pixel stride); Average/Paeth carry a
    left-pixel dependency, so those rows reconstruct pixel-at-a-time —
    fine for Arrow-batched stats decoding, swap in libpng for bulk
    raster work."""
    import zlib

    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG stream")
    pos, w = len(_PNG_SIG), None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or color not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG (depth={depth}, color={color})")
            if comp or filt or interlace:
                raise ValueError("unsupported PNG compression/filter/interlace")
            ch = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + CRC
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError("bad PNG scanline payload size")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    out = np.zeros((h, w, ch), dtype=np.uint8)
    prev = np.zeros((w, ch), dtype=np.uint8)
    for y in range(h):
        f = int(lines[y, 0])
        cur = lines[y, 1:].reshape(w, ch)
        if f == 0:
            rec = cur.copy()
        elif f == 1:  # Sub: prefix sum along x, mod 256
            rec = (np.cumsum(cur.astype(np.int64), axis=0) % 256).astype(np.uint8)
        elif f == 2:  # Up
            rec = cur + prev  # uint8 wraps mod 256
        elif f == 3:  # Average
            rec = np.zeros_like(cur)
            for x in range(w):
                left = rec[x - 1].astype(np.int16) if x else np.zeros(ch, np.int16)
                rec[x] = (
                    cur[x].astype(np.int16) + (left + prev[x].astype(np.int16)) // 2
                ).astype(np.uint8)
        elif f == 4:  # Paeth
            rec = np.zeros_like(cur)
            for x in range(w):
                for c in range(ch):
                    a = int(rec[x - 1, c]) if x else 0
                    b = int(prev[x, c])
                    cc = int(prev[x - 1, c]) if x else 0
                    rec[x, c] = (int(cur[x, c]) + _paeth(a, b, cc)) % 256
        else:
            raise ValueError(f"bad filter type {f} in row {y}")
        out[y] = rec
        prev = rec
    return out


# --------------------------------------------------------------------------
# JPEG (baseline DCT, ITU-T T.81: SOI/DQT/SOF0/DHT/SOS entropy stream)
# --------------------------------------------------------------------------

#: Standard luminance DC/AC Huffman tables (T.81 Annex K.3) as
#: (bits-per-length[1..16], symbol list). Used for every component — legal
#: (tables are arbitrary per DHT) and keeps the codec compact.
_JPG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPG_DC_VALS = list(range(12))
_JPG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPG_AC_VALS = [
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

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _huff_codes(bits, vals):
    """(bits, vals) -> {symbol: (code, length)} per T.81 C.2 canonical order."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_mat():
    import math

    m = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put(0xFF >> (8 - pad), pad)  # 1-fill padding
        return bytes(self.out)


def _mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude category + appended bits for a signed coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    bits = v if v > 0 else v + (1 << n) - 1
    return n, bits


def _encode_block(bw, D, dc_codes, ac_codes, plane, py, px, prev_dc, ci):
    blk = plane[py : py + 8, px : px + 8] - 128.0
    coef = np.round(D @ blk @ D.T).astype(np.int64)  # qtable = 1
    zz = coef.flatten()[_ZIGZAG]
    diff = int(zz[0]) - prev_dc[ci]
    prev_dc[ci] = int(zz[0])
    n, bits = _mag_bits(diff)
    bw.put(*dc_codes[n])
    if n:
        bw.put(bits, n)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            if run == 16:
                bw.put(*ac_codes[0xF0])  # ZRL
                run = 0
            continue
        n, bits = _mag_bits(v)
        bw.put(*ac_codes[(run << 4) | n])
        bw.put(bits, n)
        run = 0
    if last_nz < 63:
        bw.put(*ac_codes[0x00])  # EOB


def encode_jpeg(
    img: np.ndarray, subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """Encode (h, w) grey or (h, w, 3) RGB uint8 as a baseline JFIF JPEG:
    all-ones quantization table (quality-100-exact for block-constant
    content), standard Annex-K Huffman tables, interleaved MCU scan.

    ``subsampling``: '444' (no chroma subsampling; dims multiples of 8)
    or '420' (Y at 2x2, chroma quarter-size by 2x2 block mean — the
    format real-corpus JPEGs overwhelmingly use; dims multiples of 16).
    Constant chroma (e.g. neutral grey R=G=B) survives 4:2:0 exactly —
    the mean of a constant is the constant.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    N MCUs (T.81 §B.2.4.4/E.1.4: byte-aligned 1-padded boundaries, DC
    predictors reset, marker index cycling D0-D7) — what camera/encoder
    output uses for error resilience and what parallel decoders key on."""
    grey = img.ndim == 2
    h, w = img.shape[:2]
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    sub = subsampling == "420" and not grey
    mcu = 16 if sub else 8
    if h % mcu or w % mcu:
        raise ValueError(f"encode_jpeg needs dimensions that are multiples of {mcu}")
    if grey:
        planes = [img.astype(np.float64)]
        factors = [(1, 1)]
    else:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub:
            # 2x2 block mean, computed before the float->DCT path
            cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            factors = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    D = _dct_mat()
    dc_codes = _huff_codes(_JPG_DC_BITS, _JPG_DC_VALS)
    ac_codes = _huff_codes(_JPG_AC_BITS, _JPG_AC_VALS)
    coords = [
        (my, mx) for my in range(h // mcu) for mx in range(w // mcu)
    ]
    ri = restart_interval
    groups = (
        [coords]
        if not ri
        else [coords[i : i + ri] for i in range(0, len(coords), ri)]
    )
    parts: list[bytes] = []
    for gi, group in enumerate(groups):
        bw = _BitWriter()
        prev_dc = [0] * len(planes)  # DC predictors reset per interval
        for my, mx in group:
            for ci, plane in enumerate(planes):
                fh, fv = factors[ci]
                for byy in range(fv):
                    for bxx in range(fh):
                        _encode_block(
                            bw, D, dc_codes, ac_codes, plane,
                            my * 8 * fv + byy * 8, mx * 8 * fh + bxx * 8,
                            prev_dc, ci,
                        )
        parts.append(bw.flush())
        if gi < len(groups) - 1:
            parts.append(bytes([0xFF, 0xD0 + (gi % 8)]))
    scan = b"".join(parts)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    qt = seg(0xDB, bytes([0]) + bytes([1] * 64))  # DQT id 0, all ones
    ncomp = len(planes)
    sof_comps = b"".join(
        struct.pack(">BBB", i + 1, (factors[i][0] << 4) | factors[i][1], 0)
        for i in range(ncomp)
    )
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)
    dht = seg(0xC4, bytes([0x00]) + bytes(_JPG_DC_BITS) + bytes(_JPG_DC_VALS)) + seg(
        0xC4, bytes([0x10]) + bytes(_JPG_AC_BITS) + bytes(_JPG_AC_VALS)
    )
    sos_comps = b"".join(struct.pack(">BB", i + 1, 0x00) for i in range(ncomp))
    sos = seg(0xDA, bytes([ncomp]) + sos_comps + bytes([0, 63, 0]))
    dri = seg(0xDD, struct.pack(">H", ri)) if ri else b""
    return b"\xff\xd8" + qt + sof + dht + dri + sos + scan + b"\xff\xd9"


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:  # stuffed byte: FF 00 -> FF
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                raise ValueError(f"unexpected marker FF{nxt:02X} inside scan")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        return v

    def restart(self) -> None:
        """Consume an RSTn boundary: discard the (<8) 1-padding bits of
        the current byte, then the FF D0-D7 marker itself."""
        self.acc = 0
        self.n = 0
        if not (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected restart marker at interval boundary")
        self.pos += 2


def _huff_decode(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | br.bits(1)
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code in scan")


def _extend(bits: int, n: int) -> int:
    if n == 0:
        return 0
    return bits if bits >= (1 << (n - 1)) else bits - (1 << n) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) JPEG — greyscale, 4:4:4 or 4:2:0 color —
    into an (h, w, channels) uint8 array. Pure numpy: marker walk,
    canonical Huffman tables, interleaved-MCU entropy decode,
    zigzag/dequant, float64 IDCT, nearest-neighbor chroma upsample,
    YCbCr->RGB.

    Restart intervals (DRI + RSTn) are SUPPORTED: the boundary byte-
    aligns, the marker is consumed, DC predictors reset (T.81 §E.2.4).

    Scope (raised as errors, not wrong pixels): no progressive (SOF2),
    sampling limited to all-1x1 or Y 2x2 + chroma 1x1 (= the 4:2:0
    layout real corpora use), whole MCUs only. Swap in libjpeg-turbo for
    arbitrary wild JPEGs; `multimodal.decode_media_stats` converts every
    such raise into a reason-tagged reject row instead of a task
    failure."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    h = w = None
    comps: list[tuple[int, int]] = []  # (component id, qtable id)
    scan_comps: list[tuple[int, int, int]] = []  # (comp idx, dc table, ac table)
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tid] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                i += 65
        elif marker == 0xC0:
            depth, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if depth != 8:
                raise ValueError("only 8-bit baseline supported")
            for c in range(ncomp):
                cid, sampling, qid = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append((cid, qid, sampling >> 4, sampling & 0xF))
            fs = [(c[2], c[3]) for c in comps]
            if not (all(f == (1, 1) for f in fs)
                    or (len(fs) == 3 and fs == [(2, 2), (1, 1), (1, 1)])):
                raise ValueError(f"unsupported sampling layout {fs}")
        elif marker == 0xC2:
            # progressive stream: hand the whole file to the multi-scan
            # decoder (r7 — previously reason-rejected)
            return _decode_jpeg_progressive(data)
        elif marker in (0xC1, 0xC3):
            raise ValueError("only baseline SOF0 supported")
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(body[i + 17 : i + 17 + nvals])
                huff[(cls, tid)] = {
                    (code, length): sym
                    for sym, (code, length) in _huff_codes(bits, vals).items()
                }
                i += 17 + nvals
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            ns = body[0]
            for c in range(ns):
                cid, tabs = struct.unpack_from(">BB", body, 1 + 2 * c)
                idx = next(i for i, c in enumerate(comps) if c[0] == cid)
                scan_comps.append((idx, tabs >> 4, tabs & 0xF))
            scan_start = pos
            break
    if h is None or not scan_comps:
        raise ValueError("missing SOF/SOS segment")
    # entropy scan runs from scan_start to the EOI marker
    end = data.rfind(b"\xff\xd9")
    br = _BitReader(data[scan_start : end if end > 0 else len(data)])
    D = _dct_mat()
    nc = len(scan_comps)
    hmax = max(comps[ci][2] for ci, _, _ in scan_comps)
    vmax = max(comps[ci][3] for ci, _, _ in scan_comps)
    mcu_h, mcu_w = 8 * vmax, 8 * hmax
    if h % mcu_h or w % mcu_w:
        raise ValueError("partial MCUs unsupported (dims must fill whole MCUs)")
    planes = [
        np.zeros((h * comps[ci][3] // vmax, w * comps[ci][2] // hmax))
        for ci, _, _ in scan_comps
    ]
    prev_dc = [0] * nc

    def read_block(si, dct_id, act_id):
        dc_tab, ac_tab = huff[(0, dct_id)], huff[(1, act_id)]
        zz = np.zeros(64, dtype=np.int64)
        n = _huff_decode(br, dc_tab)
        prev_dc[si] += _extend(br.bits(n), n) if n else 0
        zz[0] = prev_dc[si]
        k = 1
        while k < 64:
            sym = _huff_decode(br, ac_tab)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            k += sym >> 4
            size = sym & 0xF
            if k > 63:
                raise ValueError("AC coefficient index out of range")
            zz[k] = _extend(br.bits(size), size)
            k += 1
        return zz

    mcu_i = 0
    for my in range(h // mcu_h):
        for mx in range(w // mcu_w):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                br.restart()
                prev_dc[:] = [0] * nc
            mcu_i += 1
            for si, (ci, dct_id, act_id) in enumerate(scan_comps):
                fh, fv = comps[ci][2], comps[ci][3]
                for byy in range(fv):
                    for bxx in range(fh):
                        zz = read_block(si, dct_id, act_id)
                        # DQT values are stored in zigzag order (T.81
                        # B.2.4.1): dequantize in zigzag space, then
                        # scatter to natural order
                        coef = np.zeros(64, dtype=np.int64)
                        coef[_ZIGZAG] = zz * qtables[comps[ci][1]]
                        blk = D.T @ (coef.reshape(8, 8).astype(np.float64)) @ D
                        py = my * 8 * fv + byy * 8
                        px = mx * 8 * fh + bxx * 8
                        planes[si][py : py + 8, px : px + 8] = blk + 128.0
    # nearest-neighbor chroma upsample back to full resolution
    for si, (ci, _, _) in enumerate(scan_comps):
        fh, fv = comps[ci][2], comps[ci][3]
        if (fh, fv) != (hmax, vmax):
            planes[si] = np.repeat(
                np.repeat(planes[si], vmax // fv, axis=0), hmax // fh, axis=1
            )
    out = np.clip(np.round(np.stack(planes)), 0, 255).astype(np.uint8)
    if nc == 1:
        return out[0][:, :, None]
    y, cb, cr = (out[i].astype(np.float64) for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# JPEG progressive (SOF2, ITU-T T.81 Annex G: spectral selection +
# successive approximation). The dominant encoding of web-scraped JPEGs —
# r6 reason-rejected these; r7 decodes them (VERDICT r6 ask #2).
# --------------------------------------------------------------------------


def _coef_blocks(plane: np.ndarray, D: np.ndarray) -> np.ndarray:
    """Forward-DCT a (h, w) float plane into (h/8, w/8, 64) zigzag-order
    int64 coefficient blocks (unit quantization — same quantizer as the
    baseline encoder, so baseline and progressive encodings of one image
    decode to IDENTICAL pixels)."""
    ph, pw = plane.shape
    out = np.zeros((ph // 8, pw // 8, 64), dtype=np.int64)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            c = np.round(D @ blk @ D.T).astype(np.int64)
            out[by, bx] = c.flatten()[_ZIGZAG]
    return out


def _enc_ac_first(bw: _BitWriter, ac, blkzz: np.ndarray, Ss: int, Se: int, Al: int) -> None:
    """First AC scan of a band (T.81 G.1.2.2): code the point-transformed
    band (|v| >> Al, sign kept — truncation toward zero). EOB runs are
    flushed as per-block EOB0 symbols: legal (a run of n EOBs == n EOB0s)
    and the Annex-K AC table lacks the EOBn (0x10..0xE0) symbols."""
    band = blkzz[Ss : Se + 1]
    pts = np.sign(band) * (np.abs(band) >> Al)
    nz = np.nonzero(pts)[0]
    if len(nz) == 0:
        bw.put(*ac[0x00])
        return
    last = int(nz[-1])
    run = 0
    for i in range(last + 1):
        v = int(pts[i])
        if v == 0:
            run += 1
            if run == 16:
                bw.put(*ac[0xF0])
                run = 0
            continue
        n, bits = _mag_bits(v)
        bw.put(*ac[(run << 4) | n])
        bw.put(bits, n)
        run = 0
    if last < Se - Ss:
        bw.put(*ac[0x00])


def _enc_ac_refine(bw: _BitWriter, ac, blkzz: np.ndarray, Ss: int, Se: int, Al: int) -> None:
    """Refinement AC scan (T.81 G.1.2.3): newly-significant coefficients
    (|v| >> Al == 1) get a (run, 1) symbol + sign bit; already-significant
    ones (|v| >> Al > 1) get buffered correction bits appended after the
    next emitted symbol — the exact interleave the decoder's walk
    consumes. ZRL flushes happen BEFORE buffering the current
    coefficient's bit (order matters: the decoder reads correction bits
    only up to the 16th skipped zero)."""
    band = blkzz[Ss : Se + 1]
    absv = np.abs(band) >> Al
    newly = np.nonzero(absv == 1)[0]
    eob = int(newly[-1]) if len(newly) else -1
    r = 0
    pending: list[int] = []
    for i in range(Se - Ss + 1):
        t = int(absv[i])
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            bw.put(*ac[0xF0])
            r -= 16
            for b in pending:
                bw.put(b, 1)
            pending = []
        if t > 1:
            pending.append(t & 1)
            continue
        bw.put(*ac[(r << 4) | 1])
        bw.put(1 if int(band[i]) > 0 else 0, 1)
        for b in pending:
            bw.put(b, 1)
        pending = []
        r = 0
    if r > 0 or pending:
        bw.put(*ac[0x00])
        for b in pending:
            bw.put(b, 1)


def encode_jpeg_progressive(img: np.ndarray, subsampling: str = "444") -> bytes:
    """Encode (h, w) grey or (h, w, 3) RGB uint8 as a PROGRESSIVE (SOF2)
    JFIF JPEG: unit quantization, standard Annex-K Huffman tables, and a
    libjpeg-style scan script — interleaved first DC scan at Al=1, Y AC
    split into a 1-5 band and a 6-63 band at Al=2, full-band chroma AC at
    Al=1, then successive-approximation refinement scans down to Al=0.
    Identical quantizer to :func:`encode_jpeg`, so the progressive and
    baseline encodings of one image decode to identical pixels."""
    grey = img.ndim == 2
    h, w = img.shape[:2]
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    sub = subsampling == "420" and not grey
    mcu = 16 if sub else 8
    if h % mcu or w % mcu:
        raise ValueError(
            f"encode_jpeg_progressive needs dimensions that are multiples of {mcu}"
        )
    if grey:
        planes = [img.astype(np.float64)]
        factors = [(1, 1)]
    else:
        r_, g_, b_ = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0
        cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0
        if sub:
            cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            factors = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    D = _dct_mat()
    coef = [_coef_blocks(p, D) for p in planes]
    dc_codes = _huff_codes(_JPG_DC_BITS, _JPG_DC_VALS)
    ac_codes = _huff_codes(_JPG_AC_BITS, _JPG_AC_VALS)
    ncomp = len(planes)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    if ncomp == 1:
        scans = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 63, 0, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    else:
        scans = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([2], 1, 63, 0, 1),
            ([1], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([2], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    encoded = []
    for cs, Ss, Se, Ah, Al in scans:
        bw = _BitWriter()
        if Ss == 0:
            prev = [0] * len(cs)
            for my in range(h // (8 * vmax)):
                for mx in range(w // (8 * hmax)):
                    for si, c in enumerate(cs):
                        fh, fv = factors[c]
                        for byy in range(fv):
                            for bxx in range(fh):
                                z0 = int(coef[c][my * fv + byy, mx * fh + bxx, 0])
                                if Ah == 0:
                                    v = z0 >> Al
                                    diff = v - prev[si]
                                    prev[si] = v
                                    n, bits = _mag_bits(diff)
                                    bw.put(*dc_codes[n])
                                    if n:
                                        bw.put(bits, n)
                                else:
                                    bw.put((z0 >> Al) & 1, 1)
        else:
            c = cs[0]
            nby, nbx, _ = coef[c].shape
            for by in range(nby):
                for bx in range(nbx):
                    if Ah == 0:
                        _enc_ac_first(bw, ac_codes, coef[c][by, bx], Ss, Se, Al)
                    else:
                        _enc_ac_refine(bw, ac_codes, coef[c][by, bx], Ss, Se, Al)
        encoded.append((cs, Ss, Se, Ah, Al, bw.flush()))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    qt = seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof_comps = b"".join(
        struct.pack(">BBB", i + 1, (factors[i][0] << 4) | factors[i][1], 0)
        for i in range(ncomp)
    )
    sof = seg(0xC2, struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)
    dht = seg(0xC4, bytes([0x00]) + bytes(_JPG_DC_BITS) + bytes(_JPG_DC_VALS)) + seg(
        0xC4, bytes([0x10]) + bytes(_JPG_AC_BITS) + bytes(_JPG_AC_VALS)
    )
    out = bytearray(b"\xff\xd8" + qt + sof + dht)
    for cs, Ss, Se, Ah, Al, sb in encoded:
        sos_comps = b"".join(struct.pack(">BB", c + 1, 0x00) for c in cs)
        out += seg(
            0xDA, bytes([len(cs)]) + sos_comps + bytes([Ss, Se, (Ah << 4) | Al])
        )
        out += sb
    out += b"\xff\xd9"
    return bytes(out)


def _entropy_end(data: bytes, start: int) -> int:
    """End of an entropy-coded segment: the first FF followed by a real
    marker (not a stuffed 00, not RST0-7)."""
    i = start
    while True:
        i = data.find(b"\xff", i)
        if i < 0 or i + 1 >= len(data):
            return len(data)
        nxt = data[i + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            i += 2
            continue
        return i


def _prog_ac_first(br, ac_tab, blk, Ss, Se, Al, eobrun):
    """T.81 G.2 / libjpeg decode_mcu_AC_first. Returns updated eobrun."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        sym = _huff_decode(br, ac_tab)
        r, s = sym >> 4, sym & 15
        if s:
            k += r
            if k > Se:
                raise ValueError("AC coefficient index out of range")
            blk[k] = _extend(br.bits(s), s) << Al
            k += 1
        else:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.bits(r)
                break
            k += 16
    return eobrun


def _prog_ac_refine(br, ac_tab, blk, Ss, Se, Al, eobrun):
    """T.81 G.2 / libjpeg decode_mcu_AC_refine: refine already-significant
    coefficients with correction bits, insert newly-significant ones at
    +-2^Al. Returns updated eobrun."""
    p1 = 1 << Al
    m1 = -p1
    k = Ss
    if eobrun == 0:
        while k <= Se:
            sym = _huff_decode(br, ac_tab)
            r, s = sym >> 4, sym & 15
            if s:
                if s != 1:
                    raise ValueError("invalid newly-significant size in AC refinement")
                s = p1 if br.bits(1) else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.bits(r)
                break
            # advance over r zero-history coefs, refining nonzero-history
            while k <= Se:
                v = int(blk[k])
                if v != 0:
                    if br.bits(1) and not (v & p1):
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= Se:
                blk[k] = s
            k += 1
    if eobrun > 0:
        while k <= Se:
            v = int(blk[k])
            if v != 0:
                if br.bits(1) and not (v & p1):
                    blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_jpeg_progressive(data: bytes) -> np.ndarray:
    """Decode a progressive (SOF2) JPEG — greyscale, 4:4:4 or 4:2:0 —
    into (h, w, channels) uint8. Multi-scan marker walk accumulating
    zigzag coefficient arrays per component: DC first/refine scans
    (interleaved or single-component), AC first scans with EOB-run
    decoding, AC refinement scans with correction bits (T.81 Annex G);
    restart markers reset DC predictors and the EOB run. One
    dequant + IDCT + upsample + YCbCr->RGB pass at EOI, identical to the
    baseline reconstruction."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    h = w = None
    comps: list[tuple[int, int, int, int]] = []  # (cid, qid, fh, fv)
    coefs: list[np.ndarray] = []
    hmax = vmax = 1
    nscans = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tid] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                i += 65
        elif marker == 0xC2:
            depth, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if depth != 8:
                raise ValueError("only 8-bit precision supported")
            for c in range(ncomp):
                cid, sampling, qid = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append((cid, qid, sampling >> 4, sampling & 0xF))
            fs = [(c[2], c[3]) for c in comps]
            if not (all(f == (1, 1) for f in fs)
                    or (len(fs) == 3 and fs == [(2, 2), (1, 1), (1, 1)])):
                raise ValueError(f"unsupported sampling layout {fs}")
            hmax = max(f[0] for f in fs)
            vmax = max(f[1] for f in fs)
            if h % (8 * vmax) or w % (8 * hmax):
                raise ValueError("partial MCUs unsupported (dims must fill whole MCUs)")
            coefs = [
                np.zeros((h * fv // (8 * vmax), w * fh // (8 * hmax), 64), np.int64)
                for _, _, fh, fv in comps
            ]
        elif marker in (0xC0, 0xC1, 0xC3):
            raise ValueError("mixed SOF in progressive stream")
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(body[i + 17 : i + 17 + nvals])
                huff[(cls, tid)] = {
                    (code, length): sym
                    for sym, (code, length) in _huff_codes(bits, vals).items()
                }
                i += 17 + nvals
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if not coefs:
                raise ValueError("SOS before SOF in progressive stream")
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tabs = struct.unpack_from(">BB", body, 1 + 2 * c)
                idx = next(i for i, cc in enumerate(comps) if cc[0] == cid)
                scan_comps.append((idx, tabs >> 4, tabs & 0xF))
            Ss, Se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            Ah, Al = ahal >> 4, ahal & 0xF
            # T.81 G.1 scan-header validity: DC scans cover exactly the DC
            # coefficient; AC bands are within 1..63; a refinement scan
            # lowers the point transform by exactly one bit. A baseline
            # scan smuggled under an SOF2 marker fails here loudly instead
            # of decoding DC-only garbage.
            if Ss == 0 and Se != 0:
                raise ValueError("invalid progressive DC scan (Se != 0)")
            if Ss > 0 and not (Ss <= Se <= 63):
                raise ValueError("invalid progressive AC band")
            if Ah != 0 and Ah != Al + 1:
                raise ValueError("invalid successive-approximation step")
            end = _entropy_end(data, pos)
            br = _BitReader(data[pos:end])
            pos = end
            nscans += 1
            eobrun = 0
            if Ss == 0:
                # DC scan — interleaved MCU order for ns>1, raster for ns==1
                prev = [0] * len(scan_comps)
                if len(scan_comps) > 1:
                    units = [
                        (si, my * fv + byy, mx * fh + bxx)
                        for my in range(h // (8 * vmax))
                        for mx in range(w // (8 * hmax))
                        for si, (ci, _, _) in enumerate(scan_comps)
                        for fh, fv in (comps[ci][2:],)
                        for byy in range(fv)
                        for bxx in range(fh)
                    ]
                    mcu_sz = sum(
                        comps[ci][2] * comps[ci][3] for ci, _, _ in scan_comps
                    )
                else:
                    ci = scan_comps[0][0]
                    nby, nbx = coefs[ci].shape[:2]
                    units = [
                        (0, b // nbx, b % nbx) for b in range(nby * nbx)
                    ]
                    mcu_sz = 1
                for ui, (si, by, bx) in enumerate(units):
                    if (
                        restart_interval
                        and ui
                        and ui % (restart_interval * mcu_sz) == 0
                    ):
                        br.restart()
                        prev = [0] * len(scan_comps)
                    ci, dct_id, _ = scan_comps[si]
                    blk = coefs[ci][by, bx]
                    if Ah == 0:
                        n = _huff_decode(br, huff[(0, dct_id)])
                        prev[si] += _extend(br.bits(n), n) if n else 0
                        blk[0] = prev[si] << Al
                    else:
                        if br.bits(1):
                            blk[0] = int(blk[0]) | (1 << Al)
            else:
                if len(scan_comps) != 1:
                    raise ValueError("progressive AC scans must be single-component")
                ci, _, act_id = scan_comps[0]
                ac_tab = huff[(1, act_id)]
                nby, nbx = coefs[ci].shape[:2]
                for b in range(nby * nbx):
                    if restart_interval and b and b % restart_interval == 0:
                        br.restart()
                        eobrun = 0
                    blk = coefs[ci][b // nbx, b % nbx]
                    if Ah == 0:
                        eobrun = _prog_ac_first(br, ac_tab, blk, Ss, Se, Al, eobrun)
                    else:
                        eobrun = _prog_ac_refine(br, ac_tab, blk, Ss, Se, Al, eobrun)
    if h is None or not coefs or nscans == 0:
        raise ValueError("missing SOF/SOS segment")
    D = _dct_mat()
    planes = []
    for ci, (cid, qid, fh, fv) in enumerate(comps):
        arr = coefs[ci]
        if qid not in qtables:
            raise ValueError("missing quantization table")
        q = qtables[qid]
        nby, nbx = arr.shape[:2]
        plane = np.zeros((nby * 8, nbx * 8))
        for by in range(nby):
            for bx in range(nbx):
                coef = np.zeros(64, dtype=np.int64)
                coef[_ZIGZAG] = arr[by, bx] * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    D.T @ coef.reshape(8, 8).astype(np.float64) @ D + 128.0
                )
        if (fh, fv) != (hmax, vmax):
            plane = np.repeat(np.repeat(plane, vmax // fv, axis=0), hmax // fh, axis=1)
        planes.append(plane)
    out = np.clip(np.round(np.stack(planes)), 0, 255).astype(np.uint8)
    if len(comps) == 1:
        return out[0][:, :, None]
    y, cb, cr = (out[i].astype(np.float64) for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# WAV (RIFF, integer PCM 16-bit)
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 1000, channels: int = 1) -> bytes:
    """Encode an int16 sample array (frames*channels interleaved) as PCM WAV."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    block = 2 * channels
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate, sample_rate * block, block, 16
    )
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    body = b"WAVE" + fmt + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a PCM WAV stream -> (sample_rate, channels, int16 samples).

    Walks the RIFF chunk list (chunks are word-aligned and may appear in
    any order, with optional extras like ``LIST``) rather than assuming
    fixed offsets.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, channels, bits, pcm = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"only 16-bit integer PCM supported (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    return rate, channels, np.frombuffer(pcm, dtype="<i2")


# --------------------------------------------------------------------------
# Y4M (YUV4MPEG2)
# --------------------------------------------------------------------------


def encode_y4m(frames: np.ndarray, fps_num: int = 25, fps_den: int = 1) -> bytes:
    """Encode an (n, h, w) uint8 luma stack as YUV4MPEG2 C444 (flat chroma)."""
    n, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 C444\n".encode()
    chroma = np.full(h * w, 128, dtype=np.uint8).tobytes()
    out = [head]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(frames[i].tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def decode_y4m(data: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """Decode YUV4MPEG2 -> (w, h, fps_num, fps_den, (n, h, w) luma stack).

    Supports C444 and C420* chroma subsampling (only the Y plane is
    returned); frame headers may carry parameters after ``FRAME``.
    """
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps_num, fps_den, cfmt = 25, 1, "444"
    for tok in data[:nl].decode("ascii", "replace").split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fps_num, fps_den = (int(x) for x in tok[1:].split(":"))
        elif tok[0] == "C":
            cfmt = tok[1:]
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if cfmt.startswith("444"):
        chroma_len = 2 * w * h
    elif cfmt.startswith("420"):
        chroma_len = (w // 2) * (h // 2) * 2
    else:
        raise ValueError(f"unsupported chroma format C{cfmt}")
    frames, pos = [], nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        pos = fnl + 1
        end = pos + w * h
        if end + chroma_len > len(data):
            raise ValueError("truncated Y4M frame")
        frames.append(np.frombuffer(data[pos:end], dtype=np.uint8).reshape(h, w))
        pos = end + chroma_len
    return w, h, fps_num, fps_den, np.stack(frames) if frames else np.empty((0, h, w), np.uint8)


# ---------------------------------------------------------------------------
# EXIF (APP1/TIFF) metadata — build + parse
# ---------------------------------------------------------------------------

#: IFD0 tags this codec round-trips (TIFF 6.0 / EXIF 2.3 baseline set)
EXIF_TAG_MAKE = 0x010F
EXIF_TAG_MODEL = 0x0110
EXIF_TAG_ORIENTATION = 0x0112
EXIF_TAG_DATETIME = 0x0132
_EXIF_TAGS = {
    EXIF_TAG_MAKE: "make",
    EXIF_TAG_MODEL: "model",
    EXIF_TAG_ORIENTATION: "orientation",
    EXIF_TAG_DATETIME: "datetime",
}


def exif_app1(
    make: str | None = None,
    model: str | None = None,
    orientation: int | None = None,
    datetime: str | None = None,
    big_endian: bool = True,
) -> bytes:
    """Build a JPEG APP1 segment carrying a minimal valid EXIF/TIFF
    block: ``Exif\\0\\0`` + TIFF header + one IFD0 with the requested
    tags (ASCII values > 4 bytes spill to the post-IFD value area, per
    TIFF 6.0 §2). Both byte orders supported — real corpora contain
    both (``II`` from most cameras, ``MM`` from older/Motorola-derived
    firmware)."""
    bo = ">" if big_endian else "<"
    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, raw)
    for tag, typ, val in (
        (EXIF_TAG_MAKE, 2, make),
        (EXIF_TAG_MODEL, 2, model),
        (EXIF_TAG_ORIENTATION, 3, orientation),
        (EXIF_TAG_DATETIME, 2, datetime),
    ):
        if val is None:
            continue
        if typ == 2:
            raw = val.encode("ascii") + b"\x00"
            entries.append((tag, 2, len(raw), raw))
        else:
            entries.append((tag, 3, 1, struct.pack(bo + "H", val) + b"\x00\x00"))
    entries.sort()  # TIFF requires ascending tag order
    n = len(entries)
    ifd_start = 8
    value_area = ifd_start + 2 + 12 * n + 4
    body = bytearray()
    body += (b"MM" if big_endian else b"II") + struct.pack(bo + "H", 42)
    body += struct.pack(bo + "I", ifd_start)
    body += struct.pack(bo + "H", n)
    spill = bytearray()
    for tag, typ, count, raw in entries:
        body += struct.pack(bo + "HHI", tag, typ, count)
        size = count * (1 if typ == 2 else 2)
        if size <= 4:
            body += raw[:4].ljust(4, b"\x00")
        else:
            body += struct.pack(bo + "I", value_area + len(spill))
            spill += raw
    body += struct.pack(bo + "I", 0)  # no next IFD
    body += spill
    payload = b"Exif\x00\x00" + bytes(body)
    return struct.pack(">BBH", 0xFF, 0xE1, len(payload) + 2) + payload


def parse_exif(data: bytes) -> dict:
    """Extract the baseline IFD0 tags from a JPEG's APP1/EXIF segment:
    ``{make, model, orientation, datetime}`` (absent tags → None).
    Raises ValueError on streams with no well-formed EXIF block —
    callers in `multimodal` convert raises to reject rows."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        if marker in (0xD9, 0xDA):  # EXIF must precede the scan
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker != 0xE1 or not body.startswith(b"Exif\x00\x00"):
            continue
        tiff = body[6:]
        if tiff[:2] == b"MM":
            bo = ">"
        elif tiff[:2] == b"II":
            bo = "<"
        else:
            raise ValueError("EXIF TIFF header has unknown byte order")
        if struct.unpack_from(bo + "H", tiff, 2)[0] != 42:
            raise ValueError("EXIF TIFF magic mismatch")
        (ifd,) = struct.unpack_from(bo + "I", tiff, 4)
        (n,) = struct.unpack_from(bo + "H", tiff, ifd)
        out: dict = {v: None for v in _EXIF_TAGS.values()}
        for i in range(n):
            off = ifd + 2 + 12 * i
            tag, typ, count = struct.unpack_from(bo + "HHI", tiff, off)
            if tag not in _EXIF_TAGS:
                continue
            if typ == 2:  # ASCII
                if count <= 4:
                    raw = tiff[off + 8 : off + 8 + count]
                else:
                    (voff,) = struct.unpack_from(bo + "I", tiff, off + 8)
                    raw = tiff[voff : voff + count]
                out[_EXIF_TAGS[tag]] = raw.rstrip(b"\x00").decode(
                    "ascii", errors="replace"
                )
            elif typ == 3:  # SHORT
                out[_EXIF_TAGS[tag]] = struct.unpack_from(bo + "H", tiff, off + 8)[0]
        return out
    raise ValueError("no EXIF APP1 segment before the scan")


# --------------------------------------------------------------------------
# GIF87a/89a — LZW-compressed palette images, optional interlace, multi-
# frame animations (public spec: CompuServe "GRAPHICS INTERCHANGE FORMAT
# Version 89a", 1990). Pure numpy/stdlib like every codec here.
# --------------------------------------------------------------------------

_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_interlace_order(h: int) -> list[int]:
    order = []
    for start, step in _GIF_INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def _lzw_compress(indices, min_code_size: int) -> bytes:
    """GIF LZW: variable-width codes LSB-first, CLEAR/EOI, 12-bit cap
    with an explicit dictionary reset (CLEAR) when the table fills."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    buf = 0
    nbits = 0
    width = min_code_size + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    nxt = eoi + 1

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    emit(clear)
    w: tuple = ()
    for k in indices:
        k = int(k)
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        # giflib convention: the width check runs after each emit against
        # the PRE-insert next code — the decoder mirrors it by counting
        # codes read (see _lzw_decompress), which stays aligned even
        # across the final flush emit that inserts nothing.
        if nxt >= (1 << width) and width < 12:
            width += 1
        if nxt < 4096:
            table[wk] = nxt
            nxt += 1
        else:  # table full — reset, like every mainstream encoder
            emit(clear)
            table = {(i,): i for i in range(clear)}
            nxt = eoi + 1
            width = min_code_size + 1
        w = (k,)
    if w:
        emit(table[w])
        # The decoder's codes-read counter still advances on this flush
        # emit even though nothing is inserted, so the width must widen
        # here too or EOI is written narrower than it will be read
        # (fuzz-found: ~7% of min_code_size=2 streams whose flush lands
        # on a width boundary failed round-trip).
        if nxt >= (1 << width) and width < 12:
            width += 1
    emit(eoi)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def _lzw_decompress(
    data: bytes, min_code_size: int, limit: int | None = None
) -> list[int]:
    # a corrupted code-size byte can be up to 255: 1 << 255 table slots
    # is an unbounded hang, not an error (found by the fuzz harness).
    # The GIF spec bounds it by the 256-color palette.
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"LZW min code size out of range: {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    pos = 0
    buf = 0
    nbits = 0
    table: dict[int, tuple] = {i: (i,) for i in range(clear)}
    nxt = eoi + 1
    # Width tracks the ENCODER's table size, which runs one entry ahead
    # of ours (it adds on every emit, we add from the second code on) —
    # so count codes READ, giflib-style, not entries added.
    counter = eoi + 1
    prev: tuple | None = None
    out: list[int] = []
    while True:
        while nbits < width:
            if pos >= len(data):
                raise EOFError("LZW stream ended before EOI")
            buf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width
        if code == clear:
            table = {i: (i,) for i in range(clear)}
            nxt = eoi + 1
            counter = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if limit is not None and len(out) >= limit:
            # enough pixels for the frame: stop before a hostile stream
            # can grow the output quadratically (entry length rises with
            # every code, so unguarded output is O(n_codes^2))
            return out
        if prev is None:
            if code not in table:
                raise ValueError(f"LZW first code {code} out of range")
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == nxt:  # the KwKwK case
            entry = prev + (prev[0],)
        else:
            raise ValueError(f"LZW code {code} out of range")
        out.extend(entry)
        if prev is not None and nxt < 4096:
            table[nxt] = prev + (entry[0],)
            nxt += 1
        counter += 1
        if counter > (1 << width) and width < 12:
            width += 1
        prev = entry


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    interlace: list[bool] | None = None,
    delay_cs: int = 10,
) -> bytes:
    """Encode index frames (each (h, w) uint8, values < len(palette))
    against one global color table. Palette length must be a power of
    two ≥ 4. Multi-frame output carries a Graphic Control Extension per
    frame (GIF89a animation shape)."""
    import struct

    p = int(palette.shape[0])
    bits = max(2, (p - 1).bit_length())
    if p != 1 << bits:
        raise ValueError("palette length must be a power of two >= 4")
    h, w = frames[0].shape
    interlace = interlace or [False] * len(frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += palette.astype(np.uint8).tobytes()
    for fi, frame in enumerate(frames):
        out += bytes((0x21, 0xF9, 4, 0)) + struct.pack("<H", delay_cs) + bytes((0, 0))
        flags = 0x40 if interlace[fi] else 0
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, flags)
        rows = frame
        if interlace[fi]:
            rows = frame[_gif_interlace_order(h), :]
        mcs = max(2, bits)
        out.append(mcs)
        lzw = _lzw_compress(rows.reshape(-1), mcs)
        for i in range(0, len(lzw), 255):
            blk = lzw[i : i + 255]
            out.append(len(blk))
            out += blk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def decode_gif(data: bytes) -> list[np.ndarray]:
    """Decode every frame to (h, w, 3) uint8 RGB (global or local color
    table, optional interlace, extensions skipped). Frames are returned
    undisposed (each frame as stored; disposal composition is a viewer
    concern, not a decode concern)."""
    import struct

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    if len(data) < 13:
        raise EOFError("GIF truncated in header")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    frames: list[np.ndarray] = []
    while True:
        if pos >= len(data):
            raise EOFError("GIF ended without trailer")
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            return frames
        if b == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while True:
                if pos >= len(data):
                    raise EOFError("GIF truncated in extension sub-blocks")
                if data[pos] == 0:
                    break
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        if pos + 9 > len(data):
            raise EOFError("GIF truncated in image descriptor")
        left, top, fw, fh, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame without any color table")
        if pos >= len(data):
            raise EOFError("GIF truncated before LZW code size")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while True:
            if pos >= len(data):
                raise EOFError("GIF truncated in image sub-blocks")
            ln = data[pos]
            if ln == 0:
                break
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decompress(bytes(lzw), mcs, limit=fw * fh)
        if len(idx) < fw * fh:
            raise EOFError("LZW output short of frame size")
        grid = np.array(idx[: fw * fh], dtype=np.int64).reshape(fh, fw)
        if iflags & 0x40:
            out = np.empty_like(grid)
            out[_gif_interlace_order(fh), :] = grid
            grid = out
        if int(grid.max(initial=0)) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        frames.append(pal[grid])
