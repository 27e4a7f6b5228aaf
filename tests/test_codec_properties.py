"""Property tests for the media codec kernels: random content must
round-trip bit-exactly through PNG (lossless) and within the pinned
error band through unit-qtable JPEG, across sizes, channel counts and
filter choices. Complements the example-based tests in
test_mediacodec.py."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tickdb_spark.operators.mediacodec import (
    decode_jpeg,
    decode_png,
    encode_jpeg,
    encode_png,
)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ch=st.sampled_from([1, 3, 4]),
    filt=st.sampled_from([None, 0, 1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_lossless(w, h, ch, filt, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    if ch == 1:
        img = img.reshape(h, w)
    out = decode_png(encode_png(img, filters=filt))
    ref = img[:, :, None] if img.ndim == 2 else img
    assert np.array_equal(out, ref)


@settings(max_examples=15, deadline=None)
@given(
    bw=st.integers(1, 4),
    bh=st.integers(1, 4),
    grey=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_unit_qtable_error_band(bw, bh, grey, seed):
    rng = np.random.default_rng(seed)
    h, w = bh * 8, bw * 8
    if grey:
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img))[:, :, 0]
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
    else:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 6


@settings(max_examples=15, deadline=None)
@given(
    bw=st.integers(1, 4),
    bh=st.integers(1, 4),
    grey=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_block_constant_always_exact(bw, bh, grey, seed):
    """The gate-oracle premise as a property: ANY block-constant image is
    bit-exact through the unit-qtable pipeline (greyscale directly;
    color via neutral grey R=G=B)."""
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, size=(bh, bw), dtype=np.uint8)
    g = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    img = g if grey else np.stack([g] * 3, axis=2)
    out = decode_jpeg(encode_jpeg(img))
    ref = img[:, :, None] if img.ndim == 2 else img
    assert np.array_equal(out, ref)


@settings(max_examples=20, deadline=None)
@given(
    bw=st.integers(1, 3),
    bh=st.integers(1, 3),
    ri=st.integers(1, 6),
    grey=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_restart_interval_roundtrip(bw, bh, ri, grey, seed):
    """DRI/RSTn streams (what real encoder output uses for error
    resilience) must decode identically to the marker-free stream: byte
    alignment, D0-D7 cycling, and DC-predictor resets all exercised for
    intervals from every-MCU up to longer-than-the-image."""
    rng = np.random.default_rng(seed)
    h, w = bh * 8, bw * 8
    blocks = rng.integers(0, 256, size=(bh, bw))
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1).astype(np.uint8)
    if not grey:
        img = np.stack([img] * 3, axis=2)
    plain = decode_jpeg(encode_jpeg(img))
    with_rst = decode_jpeg(encode_jpeg(img, restart_interval=ri))
    assert np.array_equal(plain, with_rst)


@settings(max_examples=30, deadline=None)
@given(
    kind=st.sampled_from(["jpeg", "jpeg_prog", "png", "bmp", "wav", "gif"]),
    cut=st.floats(0.05, 0.95),
    flip_at=st.floats(0.1, 0.9),
    mode=st.sampled_from(["truncate", "flip", "garbage_tail"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_malformed_bytes_never_raise_from_stats_kernel(kind, cut, flip_at, mode, seed):
    """The executor-side stats kernel must turn ANY malformed input into
    a reject row, never an exception — a single bad blob must not kill a
    100-TB task. Exercised driver-side by calling the same per-item
    helper logic the kernel uses (via a local pandas batch)."""
    import pandas as pd

    from tickdb_spark.operators import mediacodec as mc

    rng = np.random.default_rng(seed)
    img = np.repeat(
        np.repeat(rng.integers(0, 256, size=(2, 2)), 8, axis=0), 8, axis=1
    ).astype(np.uint8)
    if kind == "jpeg":
        good = mc.encode_jpeg(img, restart_interval=2)
    elif kind == "jpeg_prog":
        good = mc.encode_jpeg_progressive(img)
    elif kind == "png":
        good = mc.encode_png(img)
    elif kind == "bmp":
        good = mc.encode_bmp(np.stack([img] * 3, axis=2))
    elif kind == "gif":
        pal = np.stack([np.arange(16)] * 3, axis=1).astype(np.uint8)
        good = mc.encode_gif([img % 16], pal, interlace=[bool(seed % 2)])
    else:
        good = mc.encode_wav(rng.integers(-100, 100, size=64).astype(np.int16))
    b = bytearray(good)
    if mode == "truncate":
        b = b[: max(2, int(len(b) * cut))]
    elif mode == "flip":
        i = min(len(b) - 1, max(2, int(len(b) * flip_at)))
        b[i] ^= 0xFF
    else:
        b = b + bytes(rng.integers(0, 256, size=32, dtype=np.uint8))
    # capture the exact kernel decode_media_stats ships to executors by
    # handing it a stub DataFrame, then drive it with a local batch —
    # no Spark session needed, so hypothesis can hammer it cheaply
    import tickdb_spark.operators.multimodal as mm

    kernel_holder = {}

    class _Stub:
        def mapInPandas(self, fn, schema):
            kernel_holder["fn"] = fn
            return None

    mm.decode_media_stats(_Stub(), repartition=False)
    batches = [pd.DataFrame({"media_id": [1], "content": [bytes(b)]})]
    out = list(kernel_holder["fn"](iter(batches)))
    rows = pd.concat(out)
    assert len(rows) >= 1
    # either it decoded (flips can land in don't-care bytes) or it
    # produced exactly one reason-tagged reject row; never an exception
    stats = set(rows["stat"])
    if any(s.startswith("rejected_") for s in stats):
        assert len(rows) == 1
        assert rows["stat"].iloc[0].split("rejected_")[1] in {
            "progressive", "sampling", "truncated", "corrupt"
        }
