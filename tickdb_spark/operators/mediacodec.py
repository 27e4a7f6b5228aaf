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
