"""Multimodal column plumbing (north-star X5).

Media is an opaque ``binary`` column plus a typed metadata struct
(schemas.MEDIA_SCHEMA) — the lakehouse-native layout: bytes stay in
parquet/Iceberg, metadata is queryable columns, decode happens ONLY inside
Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
Python row objects.

The container has no image/audio codecs, so the real decode is stubbed
behind ``NotImplementedError`` (import-gated on PIL/soundfile); the
deterministic fake path keeps the Spark-side contract — schema, batch
shape, partitioning — real and tested. The driver's testdata has no binary
table, so media is derived from ``documents`` (text bytes as payload),
which also makes the metadata query oracle-checkable."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from breweries_case_spark.io.reader import load_table

MODALITIES = ("image", "audio", "video")

def build_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a MEDIA_SCHEMA-shaped table from documents: text bytes play
    the opaque payload; modality assigned round-robin; metadata filled with
    deterministic values."""
    d = load_table(spark, sf_dir, "documents")
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), modality).alias("mime"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def _decode_real(content: bytes, modality: str) -> list[float]:
    """Real decode/feature-extract — requires codec libs not present in
    this container. STUB: wire PIL/soundfile/av here when available."""
    raise NotImplementedError(
        "media decode requires codec libraries (PIL/soundfile/av) that are "
        "not installed; the deterministic fake path exercises the plumbing"
    )


def _decode_fake(content: bytes, modality: str) -> list[float]:
    """Deterministic fake 4-dim feature: byte stats. Keeps batch shapes and
    types identical to what a real extractor would emit."""
    if not content:
        return [0.0, 0.0, 0.0, 0.0]
    return [
        float(len(content)),
        float(content[0]),
        float(content[-1]),
        float(sum(content[:32]) % 997),
    ]


def extract_features(media: DataFrame, use_real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas: each batch arrives as a pandas DataFrame with the binary
    payload as bytes objects — the decode loop is per-batch Python, the
    transfer is Arrow. Partitioning of the input is preserved; at scale,
    repartition upstream so batches are ~workable-memory-sized
    (content bytes dominate)."""
    decode = _decode_real if use_real_decode else _decode_fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"]
                    .map(lambda c: 0 if c is None else len(c))
                    .astype("int64"),
                    "features": [
                        decode(c, m)
                        for c, m in zip(pdf["content"], pdf["modality"])
                    ],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("resized", T.BinaryType(), False),
    ]
)


def resize_images(
    media: DataFrame,
    width: int = 32,
    height: int = 32,
    use_real_decode: bool = False,
) -> DataFrame:
    """Image resize over the binary column (mapInPandas). The real path
    (``use_real_decode=True``) needs PIL and is a clearly-marked STUB;
    the default deterministic fake emits a payload of exactly
    width*height bytes cycled from the source so batch shapes, sizes, and
    types match a real resizer. Opt-in flag, not environment sniffing —
    merely having pillow installed must not change behavior."""
    if use_real_decode:
        raise NotImplementedError(
            "real image resize requires PIL wiring (PIL.Image.resize); "
            "the default fake path exercises the full Spark plumbing"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            pdf = pdf[pdf["modality"] == "image"]
            resized = [
                bytes(c[i % len(c)] for i in range(n)) if c else bytes(n)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "resized": resized,
                }
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ms", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, use_real_decode: bool = False
) -> DataFrame:
    """Video frame sampling (mapInPandas, 1→N rows per video): one frame
    per ``every_ms`` of duration_ms. The real path
    (``use_real_decode=True``) needs a video codec and is a
    clearly-marked STUB; the default fake emits a 16-byte slice per
    sampled timestamp. The 1→N batch shape (output rows ≠ input rows) is
    exactly what a real frame sampler produces — mapInPandas is the right
    tool because a pandas_udf cannot change cardinality."""
    if use_real_decode:
        raise NotImplementedError(
            "real frame sampling requires av/ffmpeg wiring; the default "
            "fake path exercises the full Spark plumbing"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["modality"] == "video"]
            out = {"media_id": [], "frame_idx": [], "frame_ms": [], "frame": []}
            for mid, content, dur in zip(
                pdf["media_id"], pdf["content"], pdf["meta"].map(lambda m: m["duration_ms"])
            ):
                content = content or b""  # nullable binary column
                n_frames = max(1, int(dur) // every_ms)
                for i in range(n_frames):
                    start = (i * 16) % max(1, len(content))
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(i * every_ms)
                    out["frame"].append(bytes(content[start : start + 16]))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FRAME_SCHEMA)


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline over image-modality media (rows-only; shape and
    determinism pinned by unit tests)."""
    return resize_images(build_media_table(spark, sf_dir))


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling pipeline over video-modality media (rows-only)."""
    return sample_frames(build_media_table(spark, sf_dir))


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only query over the media table: modality counts + payload
    byte totals. Never touches the binary column contents — the scan prunes
    it (columnar layout pays off exactly here)."""
    media = build_media_table(spark, sf_dir)
    return media.groupBy("modality").agg(
        F.count("*").alias("media_count"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.max("meta.duration_ms").alias("max_duration_ms"),
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction pipeline (fake decode): binary in, typed feature
    array out. Rows-only check; shape/determinism pinned by unit tests."""
    return extract_features(build_media_table(spark, sf_dir)).select(
        "media_id", "modality", "n_bytes", "features"
    )


QUERIES = {
    "q_multimodal_meta": q_multimodal_meta,
    "q_multimodal_features": q_multimodal_features,
    "q_multimodal_resize": q_multimodal_resize,
    "q_multimodal_frames": q_multimodal_frames,
}

ORACLES = {
    "q_multimodal_meta": """
        SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                               ELSE 'video' END AS modality,
               count(*) AS media_count,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               MAX(n_chars * 10) AS max_duration_ms
        FROM documents GROUP BY 1
    """,
    # q_multimodal_features: rows-only (fake decode is Spark-side plumbing).
}
