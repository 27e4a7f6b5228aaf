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
