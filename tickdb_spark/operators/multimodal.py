"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched Pandas UDFs.

The decode kernels are REAL: pure-numpy parsers for three public container
formats (24-bit BMP, RIFF/PCM WAV, YUV4MPEG2 — see ``mediacodec.py``),
written against the format specs since PIL/opencv/ffmpeg are not in this
container. Compressed codecs (JPEG/H.264/MP3) would slot into the same
mapInPandas bodies when those libraries are available; only
``_fake_decode_features`` remains a clearly-marked deterministic stand-in
for a learned embedding model.

Scale notes: media blobs ride in the same rows as metadata (parquet keeps
them in separate column chunks, so metadata-only queries never read the
bytes — column pruning is the "thumbnail index" for free). Heavy decode
fans out via ``mapInPandas`` with small ``maxRecordsPerBatch`` so a batch
of 100 MB blobs doesn't blow executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical media table schema: one row per asset, blob + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

_FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, sha string, "
    "feat array<double>"
)


def media_stats(df: DataFrame) -> DataFrame:
    """Codec-free metadata pass: byte length + content digest, JVM-side
    only (no Python, no decode) — the query that should run over all
    100 TB cheaply."""
    return df.select(
        "media_id",
        "media_type",
        F.octet_length("content").cast("long").alias("n_bytes"),
        F.sha2("content", 256).alias("sha"),
        F.col("meta.mime").alias("mime"),
    )


def _fake_decode_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic FAKE decode: derives a feature vector from raw bytes.
    Stands in for image decode + embedding; replace with a real kernel
    (PIL/torchvision/ffmpeg) when the libraries are available.

    Vectorized: feature j is (Σ bytes at positions ≡ j mod dim) mod 997 —
    modular sums are order-free, so the numpy strided sum is bit-identical
    to the original per-byte loop at ~100× the speed."""
    if content is None:
        return [0.0] * dim
    import numpy as np

    arr = np.frombuffer(content, dtype=np.uint8)
    return [float(int(arr[j::dim].sum(dtype=np.int64)) % 997) / 997.0 for j in range(dim)]


def extract_features(df: DataFrame, batch_rows: int = 64) -> DataFrame:
    """mapInPandas feature extraction over binary content.

    Real plumbing: Arrow batches, bounded batch size (blobs are big), one
    output row per input row. The decode kernel is the deterministic fake
    above; a production build swaps ``_fake_decode_features`` only.
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))
    # ship the kernel by value (workers may lack our import path)
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
    # Decode work parallelizes by input partition; a single parquet split
    # would serialize the whole corpus through one Python worker.
    df = df.repartition(spark.sparkContext.defaultParallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(lambda b: 0 if b is None else len(b)),
                    "sha": pdf["content"].map(
                        lambda b: "" if b is None else hashlib.sha256(b).hexdigest()
                    ),
                    "feat": pdf["content"].map(_fake_decode_features),
                }
            )
            yield out

    return df.mapInPandas(run, schema=_FEATURE_SCHEMA)


def extract_features_gate(df: DataFrame, batch_rows: int = 64) -> DataFrame:
    """Gate-facing contract for feature extraction: every column scalar
    (``feat`` serialized to a stable decimal string) so any downstream
    canonicalizer can sort/hash rows. The array form stays available via
    :func:`extract_features` for operator composition."""
    feats = extract_features(df, batch_rows=batch_rows)
    # format_string, NOT format_number: the latter inserts thousands-
    # grouping commas for values >= 1000 — the same character used as the
    # list separator — which would silently corrupt the serialization once
    # a real decode kernel emits large feature values.
    feat_json = F.concat_ws(
        ",", F.transform("feat", lambda x: F.format_string("%.6f", x))
    )
    return feats.select(
        "media_id", "media_type", "n_bytes", "sha", feat_json.alias("feat_json")
    )


def _codec():
    """The mediacodec module, registered for by-value cloudpickle
    serialization: decode kernels referenced from mapInPandas closures
    then travel inside the pickled closure, so executor Python workers
    never need ``tickdb_spark`` on their own import path (the driver's
    process may run from any cwd)."""
    from pyspark import cloudpickle

    from tickdb_spark.operators import mediacodec

    cloudpickle.register_pickle_by_value(mediacodec)
    return mediacodec


def _repartitioned(df: DataFrame) -> DataFrame:
    # Decode work parallelizes by input partition; a single parquet split
    # would serialize the whole corpus through one Python worker.
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def decode_image(df: DataFrame) -> DataFrame:
    """Real image decode: pure-numpy 24-bit BMP parser (public spec —
    pixel-data offset, 4-byte row padding, bottom-up rows, BGR order; see
    ``operators/mediacodec.py``) over Arrow batches.

    Returns one row per asset: ``(media_id, width, height, channels,
    px_sum, corner_sum)`` — ``px_sum`` the exact int sum of every channel
    byte, ``corner_sum`` the channel sum of the TOP-LEFT pixel (a decoder
    that forgets the bottom-up flip reports the bottom-left pixel here, so
    the oracle catches orientation bugs that order-free sums cannot).
    """
    decode_bmp = _codec().decode_bmp

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                img = decode_bmp(bytes(content))
                h, w, c = img.shape
                rows.append(
                    (
                        mid,
                        w,
                        h,
                        c,
                        int(img.sum(dtype=np.int64)),
                        int(img[0, 0].sum(dtype=np.int64)),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "channels", "px_sum", "corner_sum"]
            )

    return _repartitioned(df).mapInPandas(
        run,
        schema="media_id long, width int, height int, channels int, "
        "px_sum long, corner_sum long",
    )


def decode_audio(df: DataFrame) -> DataFrame:
    """Real audio decode: RIFF/WAVE 16-bit PCM chunk walker (pure numpy).

    Returns ``(media_id, sample_rate, n_channels, n_samples, sample_sum,
    duration_ms)`` — ``sample_sum`` the exact int64 sum of all samples.
    """
    decode_wav = _codec().decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                rate, ch, samples = decode_wav(bytes(content))
                n = len(samples) // ch
                rows.append(
                    (mid, rate, ch, n, int(samples.sum(dtype=np.int64)), n * 1000 // rate)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_channels",
                    "n_samples",
                    "sample_sum",
                    "duration_ms",
                ],
            )

    return _repartitioned(df).mapInPandas(
        run,
        schema="media_id long, sample_rate int, n_channels int, n_samples long, "
        "sample_sum long, duration_ms long",
    )


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Real frame sampling: YUV4MPEG2 parser (pure numpy; C444/C420) with
    time-based sampling — one output row per sampled frame.

    Frames are sampled at t = 0, every_ms, 2*every_ms, … for the clip
    duration; ``frame_idx = floor(t * fps_num / (1000 * fps_den))``.
    Returns ``(media_id, frame_idx, t_ms, width, height, y_sum)`` with
    ``y_sum`` the exact int64 luma-plane sum of the sampled frame.
    """
    decode_y4m = _codec().decode_y4m

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, fn, fd, frames = decode_y4m(bytes(content))
                n = len(frames)
                t = 0
                while True:
                    idx = t * fn // (1000 * fd)
                    if idx >= n:
                        break
                    rows.append((mid, idx, t, w, h, int(frames[idx].sum(dtype=np.int64))))
                    t += every_ms
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "t_ms", "width", "height", "y_sum"]
            )

    return _repartitioned(df).mapInPandas(
        run,
        schema="media_id long, frame_idx long, t_ms long, width long, height long, y_sum long",
    )


def decode_media_stats(df: DataFrame, repartition: bool = True) -> DataFrame:
    """Unified decode-stats pass over a mixed media table: sniffs the
    container from the BYTES (BMP / RIFF-WAVE magic — never the metadata
    column), decodes with the matching pure-numpy kernel, and emits stats
    in long format ``(media_id, media_type, stat, value)``.

    Long format keeps every ``value`` a non-NULL BIGINT, so the gate's
    column-sorted value hash is engine-exact with no NULL-dtype coercion.

    Malformed or out-of-scope items NEVER raise out of the kernel (a
    single bad blob must not kill a 100-TB task): each item decodes in
    its own try, and failures emit one reason-tagged reject row
    ``(media_id, <sniffed type>, 'rejected_<reason>', n_bytes)`` with
    reason ∈ progressive | sampling | truncated | corrupt — so rejects
    are queryable (and countable per reason) like any other stat.
    """
    m = _codec()
    decode_bmp, decode_wav = m.decode_bmp, m.decode_wav
    decode_png, decode_jpeg = m.decode_png, m.decode_jpeg
    decode_gif = m.decode_gif

    def reject_reason(exc: Exception) -> str:
        msg = str(exc)
        if "SOF0" in msg:  # SOF1/SOF3 extended-sequential / lossless
            return "unsupported_sof"  # progressive SOF2 decodes since r7
        if "sampling layout" in msg:
            return "sampling"
        if isinstance(exc, (IndexError, EOFError)) or "struct" in type(exc).__module__:
            return "truncated"
        return "corrupt"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                try:
                    rows += _item_stats(mid, b)
                except Exception as exc:  # noqa: BLE001 — reject, don't kill the task
                    mt = (
                        "image" if b[:2] == b"BM"
                        else "image_png" if b[:8] == b"\x89PNG\r\n\x1a\n"
                        else "image_jpeg" if b[:2] == b"\xff\xd8"
                        else "image_gif" if b[:6] in (b"GIF87a", b"GIF89a")
                        else "audio" if b[:4] == b"RIFF"
                        else "unknown"
                    )
                    rows.append((mid, mt, f"rejected_{reject_reason(exc)}", len(b)))
            yield pd.DataFrame(rows, columns=["media_id", "media_type", "stat", "value"])

    def _item_stats(mid, b):
        import numpy as np

        rows = []
        if b[:2] == b"BM":
            img = decode_bmp(b)
            h, w, c = img.shape
            rows += [
                (mid, "image", "width", w),
                (mid, "image", "height", h),
                (mid, "image", "channels", c),
                (mid, "image", "px_sum", int(img.sum(dtype=np.int64))),
                (mid, "image", "corner_sum", int(img[0, 0].sum(dtype=np.int64))),
            ]
        elif b[:8] == b"\x89PNG\r\n\x1a\n":
            img = decode_png(b)
            h, w, c = img.shape
            rows += [
                (mid, "image_png", "width", w),
                (mid, "image_png", "height", h),
                (mid, "image_png", "channels", c),
                (mid, "image_png", "px_sum", int(img.sum(dtype=np.int64))),
                (mid, "image_png", "corner_sum", int(img[0, 0].sum(dtype=np.int64))),
            ]
        elif b[:2] == b"\xff\xd8":
            img = decode_jpeg(b)
            h, w, c = img.shape
            rows += [
                (mid, "image_jpeg", "width", w),
                (mid, "image_jpeg", "height", h),
                (mid, "image_jpeg", "channels", c),
                (mid, "image_jpeg", "px_sum", int(img.sum(dtype=np.int64))),
                (mid, "image_jpeg", "corner_sum", int(img[0, 0].sum(dtype=np.int64))),
            ]
        elif b[:6] in (b"GIF87a", b"GIF89a"):
            frames = decode_gif(b)
            h, w, _ = frames[0].shape
            rows += [
                (mid, "image_gif", "width", w),
                (mid, "image_gif", "height", h),
                (mid, "image_gif", "n_frames", len(frames)),
                (
                    mid,
                    "image_gif",
                    "px_sum",
                    int(sum(f.sum(dtype=np.int64) for f in frames)),
                ),
                (mid, "image_gif", "corner_sum", int(frames[0][0, 0].sum(dtype=np.int64))),
            ]
        elif b[:4] == b"RIFF":
            rate, ch, samples = decode_wav(b)
            n = len(samples) // ch
            rows += [
                (mid, "audio", "sample_rate", rate),
                (mid, "audio", "n_samples", n),
                (mid, "audio", "sample_sum", int(samples.sum(dtype=np.int64))),
                (mid, "audio", "duration_ms", n * 1000 // rate),
            ]
        else:
            rows.append((mid, "unknown", "n_bytes", len(b)))
        return rows

    src_df = _repartitioned(df) if repartition else df
    return src_df.mapInPandas(
        run, schema="media_id long, media_type string, stat string, value long"
    )


def plant_media_assets(docs: DataFrame) -> DataFrame:
    """Synthesize REAL media bytes deterministically from ``doc_id`` —
    even ids become 24-bit BMPs, odd ids PCM WAVs — with decoded
    statistics in closed form, so a SQL oracle can verify the decoder
    from the id alone:

    image (d even):  w = 2 + d % 31, h = 2 + d % 17,
                     pixel(y, x, c) = x + y + c            (max 48 < 256)
                     ⇒ px_sum = 3·w·h·(w+h)/2, corner_sum = 3
    audio (d odd):   n = 100 + d % 50, rate = 1 kHz, base = d % 100,
                     sample[i] = base + i
                     ⇒ sample_sum = n·base + n·(n−1)/2, duration_ms = n

    Widths hit every (3·w) % 4 residue, so the BMP row padding and the
    bottom-up/BGR conventions are all exercised; the planting runs in the
    same Arrow-batched shape real ingestion would.
    """
    m = _codec()
    encode_bmp, encode_wav = m.encode_bmp, m.encode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 2 == 0:
                    w, h = 2 + d % 31, 2 + d % 17
                    img = (
                        np.arange(w, dtype=np.uint8)[None, :, None]
                        + np.arange(h, dtype=np.uint8)[:, None, None]
                        + np.arange(3, dtype=np.uint8)[None, None, :]
                    )
                    out.append((d, "image", encode_bmp(img)))
                else:
                    n, base = 100 + d % 50, d % 100
                    out.append(
                        (d, "audio", encode_wav(base + np.arange(n, dtype=np.int16)))
                    )
            yield pd.DataFrame(out, columns=["media_id", "media_type", "content"])

    return _repartitioned(docs.select("doc_id")).mapInPandas(
        run, schema="media_id long, media_type string, content binary"
    )


def plant_png_assets(docs: DataFrame) -> DataFrame:
    """Synthesize REAL compressed PNGs from ``doc_id`` with closed-form
    channel stats — the format a real corpus's images actually arrive in
    (unlike the uncompressed BMPs): even ids RGB, odd ids greyscale,
    w = 2 + d % 29, h = 2 + d % 13, pixel(y, x, c) = x + y + c (max
    43 < 256, no wrap)
    ⇒ px_sum = ch·w·h·(w+h−2)/2 + w·h·ch·(ch−1)/2,
      corner_sum = ch·(ch−1)/2.

    Rows are deflate-compressed with the filter type CYCLING 0..4 by row
    (encode_png's default), so one asset exercises every PNG unfilter
    path — None/Sub/Up/Average/Paeth — against the oracle."""
    encode_png = _codec().encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 2 + d % 29, 2 + d % 13
                ch = 3 if d % 2 == 0 else 1
                img = (
                    np.arange(w, dtype=np.uint8)[None, :, None]
                    + np.arange(h, dtype=np.uint8)[:, None, None]
                    + np.arange(ch, dtype=np.uint8)[None, None, :]
                )
                if ch == 1:
                    img = img.reshape(h, w)
                out.append((d, "image_png", encode_png(img)))
            yield pd.DataFrame(out, columns=["media_id", "media_type", "content"])

    return _repartitioned(docs.select("doc_id")).mapInPandas(
        run, schema="media_id long, media_type string, content binary"
    )


def plant_gif_assets(docs: DataFrame) -> DataFrame:
    """Synthesize REAL LZW-compressed GIF89a animations from ``doc_id``
    with closed-form stats: F = 1 + d % 3 frames of w = 2 + d % 7,
    h = 2 + d % 5, a 16-color global palette with palette[i] =
    (7i+1, 5i+2, 3i+3) (per-index RGB sum 15i + 6), and
    index(y, x, f) = x + y + f (max 14 < 16, no wrap). Frame f is
    stored INTERLACED iff (d + f) is even, so both row orders decode
    against the same closed form.

    ⇒ px_sum  = 15·(F·h·w(w−1)/2 + F·w·h(h−1)/2 + w·h·F(F−1)/2)
               + 6·w·h·F
      corner_sum = 6 (frame 0, index 0 — pins the palette origin)."""
    encode_gif = _codec().encode_gif

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        idx16 = np.arange(16)
        pal = np.stack([7 * idx16 + 1, 5 * idx16 + 2, 3 * idx16 + 3], axis=1).astype(
            np.uint8
        )
        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h, nf = 2 + d % 7, 2 + d % 5, 1 + d % 3
                base = np.add.outer(np.arange(h), np.arange(w))
                frames = [(base + f).astype(np.uint8) for f in range(nf)]
                inter = [(d + f) % 2 == 0 for f in range(nf)]
                out.append((d, "image_gif", encode_gif(frames, pal, interlace=inter)))
            yield pd.DataFrame(out, columns=["media_id", "media_type", "content"])

    return _repartitioned(docs.select("doc_id")).mapInPandas(
        run, schema="media_id long, media_type string, content binary"
    )


def plant_jpeg_assets(docs: DataFrame) -> DataFrame:
    """Synthesize REAL baseline JPEGs from ``doc_id`` — Huffman entropy
    coding + DCT through the genuine encode path — with EXACT closed-form
    stats: the planted image is constant per 8x8 block, so every AC
    coefficient is exactly 0, the unit quantization table preserves the
    DC exactly, and the decode round-trips bit-perfectly (verified in
    tests; arbitrary content would round through the DCT).

    Odd ids are greyscale 4:4:4-path: bh = 1 + d % 5, bw = 1 + d % 7
    (h = 8·bh, w = 8·bw). Even ids are neutral-grey RGB encoded 4:2:0 —
    the subsampled layout real corpora use — with even block grids
    bh = 2·(1 + d % 3), bw = 2·(1 + d % 4) (dims multiples of 16). For
    R=G=B the chroma planes are the constant 128 whatever the luma, so
    2x2 subsampling is exact and the decode round-trips bit-perfectly.
    block(i, j) = base + 3i + 5j with base = 20 + d % 100 (max < 256):
    ⇒ px_sum = ch·64·(bh·bw·base + 3·bw·bh(bh−1)/2 + 5·bh·bw(bw−1)/2)
      corner_sum = ch·base
    """
    encode_jpeg = _codec().encode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                base = 20 + d % 100
                if d % 2 == 1:
                    bh, bw = 1 + d % 5, 1 + d % 7
                else:
                    bh, bw = 2 * (1 + d % 3), 2 * (1 + d % 4)
                blocks = (
                    base
                    + 3 * np.arange(bh, dtype=np.int64)[:, None]
                    + 5 * np.arange(bw, dtype=np.int64)[None, :]
                ).astype(np.uint8)
                grey = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
                if d % 2 == 1:
                    out.append((d, "image_jpeg", encode_jpeg(grey)))
                else:
                    img = np.stack([grey] * 3, axis=2)
                    out.append(
                        (d, "image_jpeg", encode_jpeg(img, subsampling="420"))
                    )
            yield pd.DataFrame(out, columns=["media_id", "media_type", "content"])

    return _repartitioned(docs.select("doc_id")).mapInPandas(
        run, schema="media_id long, media_type string, content binary"
    )


#: Fixed malformed stubs for the robustness gate entry — byte-constant so
#: their lengths are literals in the oracle SQL. The progressive stub is
#: a structurally-valid SOF2 frame header (what a real progressive JPEG
#: opens with); the corrupt stub breaks the marker walk immediately.
# SOI + SOF2 (len 11: depth 8, 16x16, 1 component 1x1 qtable 0)
PROGRESSIVE_STUB = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
CORRUPT_STUB = b"\xff\xd8GARBAGE-NOT-A-MARKER"


def plant_robust_assets(docs: DataFrame) -> DataFrame:
    """Mixed healthy/malformed JPEG corpus for the reject-path gate:
    per doc_id (mod 3) — 0: a REAL baseline JPEG with restart interval 2
    (DRI + RSTn markers through the genuine entropy coder; 16x16 grey,
    2x2 constant blocks of (d+b) % 256 ⇒ exact closed-form sums);
    1: a REAL progressive (SOF2) JPEG of the SAME image — r6 rejected
    these with reason 'progressive', r7 decodes them to identical stats
    (the dominant web encoding is no longer a reject class);
    2: :data:`CORRUPT_STUB` (marker-walk garbage → reason 'corrupt').
    Truncated-progressive robustness (header-only SOF2 = the old
    :data:`PROGRESSIVE_STUB`) is pinned by the property tests."""
    codec = _codec()
    encode_jpeg = codec.encode_jpeg
    encode_prog = codec.encode_jpeg_progressive

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                v = d % 3
                if v == 2:
                    out.append((d, "image_jpeg", CORRUPT_STUB))
                    continue
                blocks = np.array(
                    [[(d + 0) % 256, (d + 1) % 256], [(d + 2) % 256, (d + 3) % 256]],
                    dtype=np.int64,
                ).astype(np.uint8)
                grey = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
                if v == 0:
                    out.append((d, "image_jpeg", encode_jpeg(grey, restart_interval=2)))
                else:
                    out.append((d, "image_jpeg", encode_prog(grey)))
            yield pd.DataFrame(out, columns=["media_id", "media_type", "content"])

    return _repartitioned(docs.select("doc_id")).mapInPandas(
        run, schema="media_id long, media_type string, content binary"
    )


def plant_progressive_assets(docs: DataFrame) -> DataFrame:
    """Synthesize REAL progressive (SOF2) JPEGs from ``doc_id`` through
    the genuine multi-scan path (spectral selection + successive
    approximation, ``mediacodec.encode_jpeg_progressive``) with the same
    closed-form stats as :func:`plant_jpeg_assets`: constant 8x8 blocks +
    unit quantization make every coefficient exact, so the successive-
    approximation refinement chain reconstructs bit-perfectly. Odd ids
    greyscale 4:4:4 (bh = 1 + d % 5, bw = 1 + d % 7); even ids
    neutral-grey RGB 4:2:0 (bh = 2·(1 + d % 3), bw = 2·(1 + d % 4)).
    block(i, j) = base + 3i + 5j, base = 20 + d % 100
    ⇒ px_sum = ch·64·(bh·bw·base + 3·bw·bh(bh−1)/2 + 5·bh·bw(bw−1)/2),
      corner_sum = ch·base."""
    encode_prog = _codec().encode_jpeg_progressive

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                base = 20 + d % 100
                if d % 2 == 1:
                    bh, bw = 1 + d % 5, 1 + d % 7
                else:
                    bh, bw = 2 * (1 + d % 3), 2 * (1 + d % 4)
                blocks = (
                    base
                    + 3 * np.arange(bh, dtype=np.int64)[:, None]
                    + 5 * np.arange(bw, dtype=np.int64)[None, :]
                ).astype(np.uint8)
                grey = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
                if d % 2 == 1:
                    out.append((d, "image_jpeg", encode_prog(grey)))
                else:
                    img = np.stack([grey] * 3, axis=2)
                    out.append(
                        (d, "image_jpeg", encode_prog(img, subsampling="420"))
                    )
            yield pd.DataFrame(out, columns=["media_id", "media_type", "content"])

    return _repartitioned(docs.select("doc_id")).mapInPandas(
        run, schema="media_id long, media_type string, content binary"
    )


def plant_video_assets(docs: DataFrame) -> DataFrame:
    """Synthesize YUV4MPEG2 clips from ``doc_id`` with closed-form luma
    sums: w = 4 + d % 13, h = 3 + d % 7, n_frames = 3 + d % 6 at 25 fps,
    luma(f, y, x) = f + y + x (max 33 < 256)
    ⇒ y_sum(f) = w·h·f + w·h·(w+h−2)/2."""
    encode_y4m = _codec().encode_y4m

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h, n = 4 + d % 13, 3 + d % 7, 3 + d % 6
                frames = (
                    np.arange(n, dtype=np.uint8)[:, None, None]
                    + np.arange(h, dtype=np.uint8)[None, :, None]
                    + np.arange(w, dtype=np.uint8)[None, None, :]
                )
                out.append((d, "video", encode_y4m(frames, 25, 1)))
            yield pd.DataFrame(out, columns=["media_id", "media_type", "content"])

    return _repartitioned(docs.select("doc_id")).mapInPandas(
        run, schema="media_id long, media_type string, content binary"
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents table (UTF-8 bytes as the
    blob) — lets the binary plumbing be exercised and oracle-checked
    without codec libraries."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def plant_signal_wavs(docs: DataFrame) -> DataFrame:
    """Synthesize square-wave PCM WAVs from ``doc_id`` for the framewise
    feature extractor — unlike ``plant_media_assets``'s ramp (always
    positive, zero crossings never fire), these alternate sign so every
    feature path is exercised, and the waveform is SQL-replayable:

        n = 192 + 64·(d % 4) samples, period p = 2 + d % 9,
        amplitude a = 50 + d % 1000,
        s[i] = a·(+1 if (i // p) even else −1) + (i % 7)
    """
    encode_wav = _codec().encode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                n, p, a = 192 + 64 * (d % 4), 2 + d % 9, 50 + d % 1000
                i = np.arange(n, dtype=np.int64)
                sign = np.where((i // p) % 2 == 0, 1, -1)
                s = (a * sign + i % 7).astype(np.int16)
                out.append((d, "audio", encode_wav(s)))
            yield pd.DataFrame(out, columns=["media_id", "media_type", "content"])

    return _repartitioned(docs.select("doc_id")).mapInPandas(
        run, schema="media_id long, media_type string, content binary"
    )


def audio_frame_features(df: DataFrame, frame: int = 64) -> DataFrame:
    """Framewise audio features over REAL decoded PCM — the feature-
    extraction step of an audio training pipeline (VAD, silence trim,
    loudness bucketing all start from exactly these):

    per non-overlapping ``frame``-sample window: ``energy`` = Σ s²,
    ``zcr`` = count of adjacent sign flips (s[i-1]·s[i] < 0) INSIDE the
    frame, ``peak`` = max |s|. All integer-exact BIGINTs (int16 squares
    sum exactly), so the operator is oracle-hash-checkable. Trailing
    partial frames are dropped (standard hop=frame framing).

    Scale shape: one Arrow-batched pass, ~n/frame output rows per item,
    no shuffle at all — embarrassingly parallel over blobs.
    """
    decode_wav = _codec().decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _, ch, samples = decode_wav(bytes(content))
                s = samples.astype(np.int64)
                nf = len(s) // frame
                for f in range(nf):
                    w = s[f * frame : (f + 1) * frame]
                    rows.append(
                        (
                            int(mid),
                            f,
                            int((w * w).sum()),
                            int(((w[:-1] * w[1:]) < 0).sum()),
                            int(np.abs(w).max()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "energy", "zcr", "peak"]
            )

    return df.mapInPandas(
        run,
        schema="media_id long, frame_idx long, energy long, zcr long, peak long",
    )


def plant_scene_videos(docs: DataFrame) -> DataFrame:
    """Synthesize Y4M clips with a known scene structure: 12 frames,
    w = 8 + d % 9, h = 6 + d % 5. Clips with d % 3 == 0 are constant
    luma c0 (no cut); others jump c0 → c1 at frame ``cut``:

        c0 = 40 + d % 50, c1 = c0 + 60 + d % 40, cut = 3 + d % 5
    """
    encode_y4m = _codec().encode_y4m

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h, n = 8 + d % 9, 6 + d % 5, 12
                c0 = 40 + d % 50
                frames = np.full((n, h, w), c0, dtype=np.uint8)
                if d % 3 != 0:
                    frames[3 + d % 5 :] = c0 + 60 + d % 40
                out.append((d, "video", encode_y4m(frames, 25, 1)))
            yield pd.DataFrame(out, columns=["media_id", "media_type", "content"])

    return _repartitioned(docs.select("doc_id")).mapInPandas(
        run, schema="media_id long, media_type string, content binary"
    )


def video_scene_cuts(df: DataFrame, threshold: int = 30) -> DataFrame:
    """Scene-cut detection over REAL decoded Y4M luma — the shot-
    segmentation step of a video training pipeline (clip sampling,
    per-scene captioning, dedup-by-shot all depend on it).

    A cut lands at frame f when the sum of absolute luma differences
    against frame f-1 exceeds ``threshold`` per pixel, tested in
    cleared-denominator integer form (``sad > threshold * n_px`` — no
    float mean, engine-exact). Emits one row per detected cut:
    ``(media_id, frame_idx, sad, n_px)``; cut-free clips emit nothing.

    Same scale shape as the other decode kernels: Arrow-batched
    mapInPandas, no shuffle, output bounded by cuts not frames.
    """
    decode_y4m = _codec().decode_y4m

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, _, _, luma = decode_y4m(bytes(content))
                s = luma.astype(np.int64)
                sad = np.abs(s[1:] - s[:-1]).reshape(len(s) - 1, -1).sum(axis=1)
                n_px = w * h
                for f in np.nonzero(sad > threshold * n_px)[0]:
                    rows.append((int(mid), int(f) + 1, int(sad[f]), n_px))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "sad", "n_px"])

    return df.mapInPandas(
        run, schema="media_id long, frame_idx long, sad long, n_px long"
    )


def plant_exif_assets(docs: DataFrame) -> DataFrame:
    """Tiny real JPEGs (one 8x8 grey block) with EXIF APP1 metadata
    derived closed-form from ``doc_id``:

      orientation = 1 + d % 8, make = 'Cam' || d % 5, model = 'MX' || d % 7,
      datetime = '2024:01:<01+d%28> <d%24>:<d%60 padded>:<(d*7)%60 padded>',
      byte order alternates by parity (even → big-endian 'MM', odd →
      little-endian 'II' — real corpora contain both).

    Every 10th doc (d % 10 == 0) carries NO EXIF segment — the
    metadata-absent case extract_exif must surface as NULLs, not errors.
    """
    m = _codec()
    encode_jpeg, exif_app1 = m.encode_jpeg, m.exif_app1

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                img = np.full((8, 8), 20 + d % 100, dtype=np.uint8)
                jpg = encode_jpeg(img)
                if d % 10 != 0:
                    seg = exif_app1(
                        make=f"Cam{d % 5}",
                        model=f"MX{d % 7}",
                        orientation=1 + d % 8,
                        datetime=(
                            f"2024:01:{1 + d % 28:02d} "
                            f"{d % 24:02d}:{d % 60:02d}:{(d * 7) % 60:02d}"
                        ),
                        big_endian=(d % 2 == 0),
                    )
                    jpg = jpg[:2] + seg + jpg[2:]
                out.append((d, "image_jpeg", jpg))
            yield pd.DataFrame(out, columns=["media_id", "media_type", "content"])

    return _repartitioned(docs.select("doc_id")).mapInPandas(
        run, schema="media_id long, media_type string, content binary"
    )


def extract_exif(df: DataFrame, repartition: bool = True) -> DataFrame:
    """EXIF metadata extraction over a binary media column:
    ``(media_id, has_exif, orientation, make, model, taken_at)``.
    Items without a well-formed EXIF block yield has_exif=false + NULLs
    (reject-to-row, never a task failure). Arrow-batched mapInPandas —
    the same executor-kernel shape as decode_media_stats."""
    m = _codec()
    parse_exif = m.parse_exif

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    meta = parse_exif(bytes(content))
                    rows.append(
                        (
                            int(mid),
                            True,
                            meta["orientation"],
                            meta["make"],
                            meta["model"],
                            meta["datetime"],
                        )
                    )
                except Exception:  # noqa: BLE001 — absent/malformed EXIF
                    rows.append((int(mid), False, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "has_exif", "orientation", "make", "model",
                    "taken_at",
                ],
            )

    src = _repartitioned(df) if repartition else df
    return src.select("media_id", "content").mapInPandas(
        run,
        schema=(
            "media_id long, has_exif boolean, orientation int, "
            "make string, model string, taken_at string"
        ),
    )


# ---------------------------------------------------------------------------
# Perceptual hashing: dHash over decoded pixels → near-duplicate images
# ---------------------------------------------------------------------------

#: dHash grid: 8 comparison rows × 9 sample columns → 8×8 = 64 bits.
DHASH_ROWS, DHASH_COLS = 8, 9


def plant_phash_assets(docs: DataFrame, n_docs: int = 512) -> DataFrame:
    """Plant near-duplicate IMAGE groups with closed-form dHashes, so the
    whole decode → perceptual-hash → Hamming-pair pipeline replays in SQL.

    Each ``doc_id < n_docs`` becomes one image in group ``base = d // 8``
    with variant ``v = d % 8``. Content is defined DIRECTLY in dHash grid
    space — every 8×9 grid cell is a constant-value pixel block, so the
    cell sums a dHash computes are exact integers with a closed form:

        gh       = ((g + 1) * 2654435761) % 2^31        (LCG mix — keys
                    beyond 251 apart stay decorrelated mod 251)
        V(g,r,c) = ((gh >> ((r*9+c) % 16)) + gh * (r*9+c+17)) % 251

    Variants: v0–v3 share the group's content key exactly but alternate
    container format (even v → 24-bit BMP, odd v → greyscale PNG) — the
    cross-format exact-phash duplicates a byte-level SHA can never pair —
    and v2/v3 are additionally RESIZED 2× (double the block size): the
    grid cell means are unchanged, so the dHash is bit-identical across
    the resize, the transform perceptual hashing exists for (and the
    oracle needs no size term at all). v4/v5 perturb 1/2 grid cells by
    +100 mod 251 (Hamming ≤ 2 / ≤ 4 — near-duplicates). v6/v7 get
    unrelated keys (g = 100000 + d): negative controls at Hamming ≈ 32.
    Cell blocks are cw×ch pixels with cw = 2 + base % 3,
    ch = 2 + base % 2 (w ≤ 72, h ≤ 48 after resize) — equal-size cells,
    so sum comparisons equal mean comparisons.
    """
    m = _codec()
    encode_bmp, encode_png = m.encode_bmp, m.encode_png
    rows_, cols_ = DHASH_ROWS, DHASH_COLS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        k = np.arange(rows_ * cols_, dtype=np.int64)  # grid cell index

        def grid_vals(g: int, base: int, v: int) -> np.ndarray:
            gh = ((g + 1) * 2654435761) % 2147483648
            vals = ((gh >> (k % 16)) + gh * (k + 17)) % 251
            pert = np.zeros_like(vals)
            p0 = (base % rows_) * cols_ + (base % cols_)
            if v in (4, 5):
                pert[p0] = 100
            if v == 5:
                pert[((base * 3 + 1) % rows_) * cols_ + (base * 5 + 2) % cols_] = 100
            return ((vals + pert) % 251).reshape(rows_, cols_)

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                base, v = d // 8, d % 8
                g = base if v <= 5 else 100000 + d
                M = grid_vals(g, base, v)
                cw, ch = 2 + base % 3, 2 + base % 2
                if v in (2, 3):  # resized re-encode: same cell means
                    cw, ch = cw * 2, ch * 2
                gray = np.kron(M, np.ones((ch, cw), dtype=np.int64)).astype(np.uint8)
                if v % 2 == 0:
                    content = encode_bmp(np.repeat(gray[:, :, None], 3, axis=2))
                    mt = "image_bmp"
                else:
                    content = encode_png(gray)
                    mt = "image_png"
                out.append((d, mt, content))
            yield pd.DataFrame(out, columns=["media_id", "media_type", "content"])

    return _repartitioned(
        docs.select("doc_id").where(F.col("doc_id") < n_docs)
    ).mapInPandas(run, schema="media_id long, media_type string, content binary")


def image_dhash(df: DataFrame) -> DataFrame:
    """REAL perceptual hash: decode each image (container sniffed from the
    bytes — BMP or PNG, the pure-numpy kernels in ``mediacodec.py``), sum
    luma into an 8×9 grid, and emit the 64-bit dHash as two BIGINT halves
    ``(dhash_hi, dhash_lo)`` (bit 63 in an int64 would flip the sign —
    two non-negative 32-bit halves keep every engine comparison exact).

    Bit k = r*8+c is set iff grid cell (r, c+1) outweighs (r, c), compared
    by EXACT integer cross-multiplication of (sum, count) — division-free,
    so unequal cell sizes at arbitrary dimensions still compare exactly.
    Grid boundaries use the per-index formula ``lo_i = i * dim // n``
    (both engines integer-floor it identically). Luma = channel sum:
    dHash is invariant to any uniform positive channel scaling, so the
    1-channel PNG and the 3× replicated-channel BMP of the same content
    hash identically — the cross-format dedup property.
    """
    m = _codec()
    decode_bmp, decode_png = m.decode_bmp, m.decode_png
    rows_, cols_ = DHASH_ROWS, DHASH_COLS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                if b[:2] == b"BM":
                    img = decode_bmp(b)
                elif b[:8] == b"\x89PNG\r\n\x1a\n":
                    img = decode_png(b)
                else:
                    continue  # reject-to-drop: not an image we hash
                luma = img.astype(np.int64)
                while luma.ndim > 2:
                    luma = luma.sum(axis=-1)
                h, w = luma.shape
                rb = [r * h // rows_ for r in range(rows_)]
                cb = [c * w // cols_ for c in range(cols_)]
                sums = np.add.reduceat(np.add.reduceat(luma, rb, axis=0), cb, axis=1)
                rn = np.diff(rb + [h]).astype(np.int64)
                cn = np.diff(cb + [w]).astype(np.int64)
                cnt = rn[:, None] * cn[None, :]
                left_s, right_s = sums[:, :-1], sums[:, 1:]
                left_n, right_n = cnt[:, :-1], cnt[:, 1:]
                bits = (right_s * left_n > left_s * right_n).astype(np.uint64)
                flat = bits.reshape(-1)  # k = r*8 + c
                weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
                lo = int((flat[:32] * weights[:32]).sum(dtype=np.uint64))
                hi = int((flat[32:] * weights[:32]).sum(dtype=np.uint64))
                out.append((int(mid), hi, lo))
            yield pd.DataFrame(out, columns=["media_id", "dhash_hi", "dhash_lo"])

    return df.mapInPandas(run, schema="media_id long, dhash_hi long, dhash_lo long")


def image_resize(df: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """Real image RESIZE as an Arrow-batched transform — the remaining
    member of the brief's decode / feature-extract / resize /
    frame-sample quartet: decode each asset (BMP or PNG, the pure-numpy
    kernels), downscale to ``(out_h, out_w)`` by EXACT box means over
    the same per-index grid the dHash uses (``lo_i = i * dim // n``;
    block value = channel sum // pixel count, integer floor — fully
    deterministic, no float resampling), and re-encode as 24-bit BMP.
    Returns ``(media_id, content, width, height)``; non-images and
    assets smaller than the target drop (reject-to-drop, the decode
    tier's convention).

    Scale: pure per-asset work in ``mapInPandas`` — one Arrow batch in,
    one out, no shuffle; at 100 TB this is a scan-speed column rewrite.
    Box means (not nearest-neighbor) make the output usable for
    fingerprinting: an exact k× box-mean downscale preserves dHash grid
    cell means, so resized thumbnails dedup against their originals.
    """
    m = _codec()
    decode_bmp, decode_png, encode_bmp = m.decode_bmp, m.decode_png, m.encode_bmp

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                if b[:2] == b"BM":
                    img = decode_bmp(b)
                elif b[:8] == b"\x89PNG\r\n\x1a\n":
                    img = decode_png(b)
                else:
                    continue
                if img.ndim == 2:
                    img = np.repeat(img[:, :, None], 3, axis=2)
                h, w = img.shape[:2]
                if h < out_h or w < out_w:
                    continue
                acc = img.astype(np.int64)
                rb = [r * h // out_h for r in range(out_h)]
                cb = [c * w // out_w for c in range(out_w)]
                sums = np.add.reduceat(np.add.reduceat(acc, rb, axis=0), cb, axis=1)
                rn = np.diff(rb + [h]).astype(np.int64)
                cn = np.diff(cb + [w]).astype(np.int64)
                cnt = (rn[:, None] * cn[None, :])[:, :, None]
                small = (sums // cnt).astype(np.uint8)
                out.append((int(mid), bytearray(encode_bmp(small)), out_w, out_h))
            yield pd.DataFrame(
                out, columns=["media_id", "content", "width", "height"]
            )

    return df.mapInPandas(
        run, schema="media_id long, content binary, width int, height int"
    )


AUDIO_FP_FRAME = 2  # samples per energy frame
AUDIO_FP_BITS = 64  # fingerprint width (needs AUDIO_FP_BITS+1 frames)


def audio_fingerprint(df: DataFrame) -> DataFrame:
    """Audio FINGERPRINT over real decoded PCM — the audio twin of the
    image dHash, completing dedup across all three modalities (text
    fingerprints, image dHash, now audio): frame the first
    ``(AUDIO_FP_BITS+1) * AUDIO_FP_FRAME`` samples into 2-sample energy
    frames (Σ s², integer-exact), and set bit k iff the energy RISES
    from frame k to k+1 — the energy-envelope shape, which is what
    survives loudness changes and re-encoding (a scaled copy keeps
    every rise/fall). Emits ``(media_id, dhash_hi, dhash_lo)`` — the
    same two-halves layout as ``image_dhash`` ON PURPOSE, so
    ``dedup.dhash_near_pairs``'s pigeonhole Hamming join works
    unchanged on audio. Clips shorter than the fingerprint window drop
    (reject-to-drop). Multi-channel PCM is fingerprinted over the
    interleaved stream (per-frame energy then sums channels — still
    deterministic; a per-channel variant would downmix first)."""
    decode_wav = _codec().decode_wav
    need = (AUDIO_FP_BITS + 1) * AUDIO_FP_FRAME

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                if b[:4] != b"RIFF":
                    continue
                _, ch, samples = decode_wav(b)
                s = samples.astype(np.int64)
                if len(s) < need:
                    continue
                w = s[:need].reshape(AUDIO_FP_BITS + 1, AUDIO_FP_FRAME)
                e = (w * w).sum(axis=1)
                bits = (e[1:] > e[:-1]).astype(np.uint64)
                weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
                lo = int((bits[:32] * weights[:32]).sum(dtype=np.uint64))
                hi = int((bits[32:] * weights[:32]).sum(dtype=np.uint64))
                out.append((int(mid), hi, lo))
            yield pd.DataFrame(out, columns=["media_id", "dhash_hi", "dhash_lo"])

    return df.mapInPandas(run, schema="media_id long, dhash_hi long, dhash_lo long")
