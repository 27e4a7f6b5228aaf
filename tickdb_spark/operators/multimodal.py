"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched Pandas UDFs.

The real decode/resize/frame-sample kernels need image/audio libraries not
present in this container — they are STUBBED behind ``NotImplementedError``
or a clearly-marked deterministic fake. Everything Spark-side is real and
tested: schema, partition sizing, mapInPandas batch shape, metadata
extraction that doesn't need a codec.

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


def decode_image(df: DataFrame) -> DataFrame:
    """Real image decode — requires PIL/opencv, not in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv on executors; wire the kernel into "
        "extract_features' mapInPandas body (plumbing is ready)"
    )


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Real frame sampling — requires ffmpeg/pyav, not in this container."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg/pyav on executors; use the "
        "extract_features mapInPandas pattern with one output row per frame"
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
