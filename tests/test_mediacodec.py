"""Pure-numpy media codec kernels: roundtrips and the format corners a
naive parser gets wrong (BMP row padding / bottom-up / BGR / pixel offset,
RIFF chunk walking, Y4M chroma formats). No Spark session needed — these
run in milliseconds and pin the kernels the mapInPandas operators ship to
executors."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tickdb_spark.operators.mediacodec import (
    decode_bmp,
    decode_jpeg,
    decode_png,
    decode_wav,
    decode_y4m,
    encode_bmp,
    encode_jpeg,
    encode_png,
    encode_wav,
    encode_y4m,
)


@pytest.mark.parametrize("w,h", [(2, 2), (3, 5), (4, 1), (5, 3), (33, 18), (127, 2)])
def test_bmp_roundtrip_all_padding_residues(w, h):
    img = np.random.default_rng(w * 1000 + h).integers(0, 256, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_orientation_top_left_pixel():
    # pixel(y, x, c) = x + y + c: top-left is (0,1,2); a decoder that skips
    # the bottom-up flip would report the bottom-left (h-1, h, h+1) instead.
    h, w = 5, 7
    img = (
        np.arange(w, dtype=np.uint8)[None, :, None]
        + np.arange(h, dtype=np.uint8)[:, None, None]
        + np.arange(3, dtype=np.uint8)[None, None, :]
    )
    out = decode_bmp(encode_bmp(img))
    assert list(out[0, 0]) == [0, 1, 2]
    assert list(out[h - 1, 0]) == [h - 1, h, h + 1]


def test_bmp_top_down_negative_height():
    # height < 0 means top-down row order per the spec
    img = np.random.default_rng(1).integers(0, 256, (4, 6, 3)).astype(np.uint8)
    data = bytearray(encode_bmp(img[::-1]))  # encoder wrote it bottom-up
    struct.pack_into("<i", data, 14 + 8, -4)  # flip to top-down declaration
    assert np.array_equal(decode_bmp(bytes(data)), img[::-1][::-1])


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"PNG....definitely not a bmp....................................")
    img = np.zeros((2, 2, 3), np.uint8)
    data = bytearray(encode_bmp(img))
    struct.pack_into("<H", data, 14 + 14, 8)  # bpp 8 (palette) unsupported
    with pytest.raises(ValueError):
        decode_bmp(bytes(data))


def test_wav_roundtrip_and_chunk_walk():
    s = (np.arange(137, dtype=np.int16) - 50) * 3
    rate, ch, out = decode_wav(encode_wav(s, sample_rate=8000))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(out, s)
    # insert a LIST chunk (odd-sized, word-aligned) before data: the chunk
    # walker must skip it, not assume fixed offsets
    raw = encode_wav(s, sample_rate=8000)
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
    patched = raw[:fmt_end] + extra + raw[fmt_end:]
    patched = struct.pack("<4sI", b"RIFF", len(patched) - 8) + patched[8:]
    rate2, _, out2 = decode_wav(patched)
    assert rate2 == 8000 and np.array_equal(out2, s)


def test_wav_stereo_interleave():
    s = np.arange(20, dtype=np.int16)
    rate, ch, out = decode_wav(encode_wav(s, sample_rate=1000, channels=2))
    assert ch == 2 and len(out) // ch == 10
    assert np.array_equal(out, s)


def test_y4m_roundtrip_c444_and_c420():
    fr = np.random.default_rng(3).integers(0, 256, (4, 6, 8)).astype(np.uint8)
    w, h, fn, fd, out = decode_y4m(encode_y4m(fr, 30, 1))
    assert (w, h, fn, fd) == (8, 6, 30, 1)
    assert np.array_equal(out, fr)
    # hand-build a C420 stream: Y plane + two quarter-size chroma planes
    head = b"YUV4MPEG2 W8 H6 F25:1 C420jpeg\n"
    chroma = bytes(4 * 3 * 2)
    data = head + b"".join(b"FRAME\n" + fr[i].tobytes() + chroma for i in range(4))
    w2, h2, _, _, out2 = decode_y4m(data)
    assert (w2, h2) == (8, 6) and np.array_equal(out2, fr)


def test_y4m_rejects_garbage():
    with pytest.raises(ValueError):
        decode_y4m(b"MPEG4...\n")
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C444\nFRAME\n\x00\x00")  # truncated


@pytest.mark.parametrize("filt", [None, 0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_roundtrip_every_filter_and_colortype(filt, ch):
    rng = np.random.default_rng(7 * ch + (0 if filt is None else filt + 1))
    img = rng.integers(0, 256, size=(11, 13, ch), dtype=np.uint8)
    if ch == 1:
        img = img.reshape(11, 13)
    out = decode_png(encode_png(img, filters=filt))
    ref = img[:, :, None] if img.ndim == 2 else img
    assert out.shape == ref.shape
    assert np.array_equal(out, ref)


def test_png_idat_split_and_chunk_walk():
    """IDAT may be split across chunks; extra ancillary chunks must be
    skipped by length, not assumed absent."""
    import struct as _s
    import zlib as _z

    img = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    data = encode_png(img, filters=2)
    # split the single IDAT into two and inject a tEXt chunk between them
    sig_end = 8
    (ihdr_len,) = _s.unpack_from(">I", data, sig_end)
    idat_pos = sig_end + 12 + ihdr_len
    (idat_len,) = _s.unpack_from(">I", data, idat_pos)
    body = data[idat_pos + 8 : idat_pos + 8 + idat_len]
    rest = data[idat_pos + 12 + idat_len :]

    def chunk(ctype, b):
        return (
            _s.pack(">I", len(b)) + ctype + b
            + _s.pack(">I", _z.crc32(ctype + b) & 0xFFFFFFFF)
        )

    patched = (
        data[:idat_pos]
        + chunk(b"IDAT", body[:3])
        + chunk(b"tEXt", b"Comment\x00hi")
        + chunk(b"IDAT", body[3:])
        + rest
    )
    assert np.array_equal(decode_png(patched), img)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"\x89JPG\r\n\x1a\n" + bytes(40))
    img16 = encode_png(np.zeros((2, 2), np.uint8))
    # corrupt IHDR bit depth to 16
    bad = bytearray(img16)
    bad[8 + 8 + 8] = 16  # sig + len/type + width/height -> depth byte
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_jpeg_block_constant_exact_roundtrip():
    """With a unit quantization table, block-constant content has every
    AC coefficient exactly 0 and an integer DC — the lossy pipeline
    (DCT -> quant -> Huffman -> decode) is bit-exact on these images.
    This is what makes the JPEG gate oracle closed-form."""
    rng = np.random.default_rng(11)
    for _ in range(4):
        bh, bw = int(rng.integers(1, 6)), int(rng.integers(1, 6))
        blocks = rng.integers(0, 256, size=(bh, bw), dtype=np.uint8)
        grey = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
        out = decode_jpeg(encode_jpeg(grey))
        assert out.shape == (bh * 8, bw * 8, 1)
        assert np.array_equal(out[:, :, 0], grey)
    # neutral-grey RGB: YCbCr forward/backward is exact when R=G=B
    rgb = np.stack([grey] * 3, axis=2)
    assert np.array_equal(decode_jpeg(encode_jpeg(rgb)), rgb)


def test_jpeg_arbitrary_content_near_lossless_with_unit_qtable():
    rng = np.random.default_rng(13)
    grey = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(grey))[:, :, 0]
    assert np.abs(out.astype(int) - grey.astype(int)).max() <= 2
    rgb = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(rgb))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 6


def test_jpeg_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((10, 10), np.uint8))  # not multiple-of-8
    good = encode_jpeg(np.zeros((8, 8), np.uint8))
    bad = bytearray(good)
    sof = good.find(b"\xff\xc0")
    bad[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


def test_decode_image_audio_operators(spark):
    """The wide-format Spark operators over planted assets: decode_image
    reports exact dims/sums for BMPs, decode_audio exact sample stats
    for WAVs — the operator-composition API next to the long-format
    gate contract."""
    from pyspark.sql import functions as F

    from tickdb_spark.operators.multimodal import (
        decode_audio,
        decode_image,
        plant_media_assets,
    )

    docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    media = plant_media_assets(docs)
    imgs = {r.media_id: r for r in decode_image(media.where("media_type = 'image'")).collect()}
    for d in range(0, 40, 2):
        w, h = 2 + d % 31, 2 + d % 17
        r = imgs[d]
        assert (r.width, r.height, r.channels) == (w, h, 3)
        assert r.px_sum == 3 * w * h * (w + h) // 2
        assert r.corner_sum == 3
    auds = {r.media_id: r for r in decode_audio(media.where("media_type = 'audio'")).collect()}
    for d in range(1, 40, 2):
        n, base = 100 + d % 50, d % 100
        r = auds[d]
        assert (r.sample_rate, r.n_channels, r.n_samples) == (1000, 1, n)
        assert r.sample_sum == n * base + n * (n - 1) // 2
        assert r.duration_ms == n


def test_jpeg_420_neutral_exact_and_smaller():
    """4:2:0: neutral-grey RGB (chroma planes constant 128 whatever the
    luma) survives subsampling bit-exactly, and the stream is smaller
    than 4:4:4 of the same image."""
    rng = np.random.default_rng(17)
    blocks = rng.integers(0, 256, size=(2, 4), dtype=np.uint8)
    g = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))  # 16 x 32
    img = np.stack([g] * 3, axis=2)
    enc420 = encode_jpeg(img, subsampling="420")
    assert np.array_equal(decode_jpeg(enc420), img)
    assert len(enc420) < len(encode_jpeg(img))
    # smoothly varying color stays tight through the lossy chroma path
    yy, xx = np.mgrid[0:32, 0:32]
    smooth = np.stack(
        [(4 * yy) % 256, (4 * xx) % 256, (2 * yy + 2 * xx) % 256], axis=2
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(smooth, subsampling="420"))
    assert np.abs(out.astype(int) - smooth.astype(int)).max() <= 8


def test_jpeg_420_requires_whole_mcus():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((8, 8, 3), np.uint8), subsampling="420")


def test_jpeg_progressive_roundtrip_and_baseline_equivalence():
    from tickdb_spark.operators.mediacodec import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    # block-constant grey: exact
    blocks = rng.integers(0, 256, (2, 3), dtype=np.int64).astype(np.uint8)
    grey = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    out = decode_jpeg(encode_jpeg_progressive(grey))
    assert np.array_equal(out[:, :, 0], grey)
    # arbitrary content: progressive decode must be BIT-IDENTICAL to the
    # baseline decode (same quantizer, successive approximation is exact)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(img)), decode_jpeg(encode_jpeg(img))
    )
    img420 = rng.integers(0, 256, (32, 16, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(img420, subsampling="420")),
        decode_jpeg(encode_jpeg(img420, subsampling="420")),
    )


def test_jpeg_progressive_rejects_malformed_scans():
    from tickdb_spark.operators.mediacodec import encode_jpeg_progressive

    # a baseline scan smuggled under a rewritten SOF2 marker must raise
    # (its SOS says Ss=0, Se=63 — an illegal progressive DC scan)
    good = encode_jpeg(np.zeros((8, 8), np.uint8))
    bad = bytearray(good)
    bad[good.find(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    # header-only SOF2 (the old PROGRESSIVE_STUB shape) must still raise
    from tickdb_spark.operators.multimodal import PROGRESSIVE_STUB

    with pytest.raises(ValueError):
        decode_jpeg(PROGRESSIVE_STUB)
    # truncating a real progressive stream mid-scan must raise, not loop
    full = encode_jpeg_progressive(np.arange(64, dtype=np.uint8).reshape(8, 8))
    with pytest.raises(Exception):
        decode_jpeg(full[: int(len(full) * 0.6)])


def test_gif_roundtrip_interlace_multiframe_and_palettes():
    """GIF LZW round-trip across the planted parameter grid, interlaced
    and sequential row orders, multi-frame, and random palettes/sizes
    big enough to cross every code width and force dictionary resets."""
    import numpy as np

    from tickdb_spark.operators.mediacodec import decode_gif, encode_gif

    idx16 = np.arange(16)
    pal = np.stack([7 * idx16 + 1, 5 * idx16 + 2, 3 * idx16 + 3], axis=1).astype(
        np.uint8
    )
    for d in (2, 6, 10, 46, 58, 186, 326, 338):  # incl. former flush-boundary bugs
        w, h, nf = 2 + d % 7, 2 + d % 5, 1 + d % 3
        base = np.add.outer(np.arange(h), np.arange(w))
        frames = [(base + f).astype(np.uint8) for f in range(nf)]
        inter = [(d + f) % 2 == 0 for f in range(nf)]
        out = decode_gif(encode_gif(frames, pal, interlace=inter))
        assert len(out) == nf
        for f in range(nf):
            assert (out[f] == pal[frames[f]]).all(), (d, f)

    rng = np.random.default_rng(9)
    for trial in range(6):
        p = 1 << int(rng.integers(2, 9))
        palr = rng.integers(0, 256, size=(p, 3)).astype(np.uint8)
        img = rng.integers(0, p, size=(90, 130)).astype(np.uint8)
        out = decode_gif(encode_gif([img], palr, interlace=[bool(trial % 2)]))[0]
        assert (out == palr[img]).all()


def test_gif_rejects_malformed():
    import numpy as np
    import pytest

    from tickdb_spark.operators.mediacodec import decode_gif, encode_gif

    pal = np.zeros((4, 3), dtype=np.uint8)
    good = encode_gif([np.zeros((3, 3), dtype=np.uint8)], pal)
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + good[6:])
    with pytest.raises((EOFError, IndexError)):
        decode_gif(good[: len(good) // 2])  # truncated mid-stream
    with pytest.raises(ValueError):
        encode_gif([np.zeros((2, 2), dtype=np.uint8)], np.zeros((5, 3), np.uint8))


def test_gif_truncation_and_flip_raise_codec_family_only():
    """EVERY prefix of a valid GIF and random byte flips must raise the
    codec's ValueError/EOFError family — never IndexError / KeyError /
    struct.error — so direct callers can classify rejects uniformly
    (decode_media_stats's broad except masked this before r8)."""
    import numpy as np

    from tickdb_spark.operators.mediacodec import decode_gif, encode_gif

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
    f = rng.integers(0, 16, size=(12, 17)).astype(np.uint8)
    blob = encode_gif([f, (f + 1) % 16], pal)
    for cut in range(1, len(blob)):
        try:
            decode_gif(blob[:cut])
        except (ValueError, EOFError):
            pass  # the only acceptable family
    for _ in range(800):
        b = bytearray(blob)
        b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        try:
            decode_gif(bytes(b))
        except (ValueError, EOFError):
            pass


def test_gif_lzw_mcs2_flush_boundary_roundtrip():
    """min_code_size=2 (4-color palettes) round-trip: the encoder's
    final flush emit must widen the code width exactly like mid-stream
    emits, or EOI is written one bit narrower than the decoder reads it
    (fuzz-found r8: ~7% of random 4-color frames failed before the fix)."""
    import numpy as np

    from tickdb_spark.operators.mediacodec import (
        _lzw_compress,
        _lzw_decompress,
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(281)
    for trial in range(400):
        n = int(rng.integers(1, 400))
        vals = rng.integers(0, 4, size=n).astype(np.uint8)
        assert _lzw_decompress(_lzw_compress(vals, 2), 2) == list(vals), (trial, n)
    pal4 = rng.integers(0, 256, size=(4, 3)).astype(np.uint8)
    for trial in range(60):
        h, w = int(rng.integers(1, 25)), int(rng.integers(1, 25))
        fr = rng.integers(0, 4, size=(h, w)).astype(np.uint8)
        out = decode_gif(encode_gif([fr], pal4))[0]
        assert (out == pal4[fr]).all(), (trial, h, w)
