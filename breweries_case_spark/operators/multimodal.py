"""Multimodal column plumbing (north-star X5).

Media is an opaque ``binary`` column plus a typed metadata struct
(schemas.MEDIA_SCHEMA) — the lakehouse-native layout: bytes stay in
parquet/Iceberg, metadata is queryable columns, decode happens ONLY inside
Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
Python row objects.

Decode is REAL for the formats a pure-stdlib parser covers: RIFF/WAV
(PCM16) and 24-bit BMP, with matching synthesizers (``synth_media_table``)
so the decode/resize pipelines run end-to-end on genuine binaries —
``q_multimodal_decode`` / ``q_multimodal_resize_real``. Video containers
need an actual codec library (av/ffmpeg) absent here, so that branch is
the one remaining clearly-marked ``NotImplementedError`` stub, shadowed by
a deterministic fake that keeps the Spark-side contract — schema, batch
shape, 1→N cardinality — real and tested. The driver's testdata has no
binary table, so the oracle-checked metadata query derives media from
``documents`` (text bytes as payload)."""

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


def synth_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media table whose audio/image payloads are REAL binaries the
    stdlib codecs above can round-trip: audio docs carry a deterministic
    sawtooth PCM16 WAV (period/length derived from doc_id/n_chars),
    image docs an 8×8 24-bit BMP whose pixels hash (x, y, doc_id).
    Video docs keep fake bytes — synthesizing a real container needs the
    same codec libs decoding one would. Built in mapInPandas so bytes are
    assembled batch-wise Python-side and travel to the JVM as Arrow
    binary, never row objects."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def run(batches):
        for pdf in batches:
            out = {"media_id": [], "modality": [], "content": []}
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                m = MODALITIES[int(doc_id) % 3]
                if m == "audio":
                    period = int(doc_id) % 50 + 2
                    n = min(int(n_chars), 400)
                    samples = [
                        ((i % period) * 1200 - period * 600) for i in range(n)
                    ]
                    content = make_wav(samples)
                elif m == "image":
                    content = make_bmp(
                        8, 8,
                        lambda x, y, s=int(doc_id): (
                            (x * 31 + s) % 256,
                            (y * 57 + s) % 256,
                            (x * y + s) % 256,
                        ),
                    )
                else:
                    content = bytes((int(doc_id) + i) % 256 for i in range(64))
                out["media_id"].append(int(doc_id))
                out["modality"].append(m)
                out["content"].append(content)
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("modality", T.StringType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )
    return d.mapInPandas(run, schema)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


# --- real pure-stdlib codecs: RIFF/WAV (PCM16 mono) and BMP (24-bit) --------
# Public formats, no external libs. Video containers genuinely need a codec
# library, so that branch stays a clearly-marked stub.


def make_wav(samples: list[int], sample_rate: int = 16000) -> bytes:
    """Encode mono PCM16 samples as a canonical RIFF/WAVE file. Sample
    bytes are packed explicitly little-endian (``<h``), as the WAV spec
    requires — not via array.array('h'), whose byte order follows the
    host and would emit non-spec PCM16 on a big-endian machine."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def parse_wav(content: bytes) -> tuple[int, list[int]]:
    """Decode a mono PCM16 RIFF/WAVE file → (sample_rate, samples). Walks
    the chunk list like a real parser (fmt anywhere before data, odd-size
    padding) and rejects compressed/stereo/other-width streams. Samples
    are unpacked explicitly little-endian per spec (see make_wav)."""
    import struct

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        size = struct.unpack("<I", content[pos + 4 : pos + 8])[0]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if (fmt, ch, bits) != (1, 1, 16):
                raise ValueError(f"unsupported WAV format {(fmt, ch, bits)}")
        elif cid == b"data":
            samples = list(struct.unpack(f"<{len(body) // 2}h", body[: len(body) // 2 * 2]))
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt or data chunk")
    return rate, samples


def make_bmp(width: int, height: int, pixel_fn) -> bytes:
    """Encode a 24-bit uncompressed bottom-up BMP; ``pixel_fn(x, y)`` →
    (r, g, b)."""
    import struct

    row_pad = (-(width * 3)) % 4
    rows = []
    for y in range(height - 1, -1, -1):
        row = bytearray()
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            row += bytes((b, g, r))
        row += b"\x00" * row_pad
        rows.append(bytes(row))
    data = b"".join(rows)
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0)
        + data
    )


def parse_bmp(content: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Decode a 24-bit uncompressed BMP → (width, height, row-major
    top-down pixel list)."""
    import struct

    if content[:2] != b"BM":
        raise ValueError("not a BMP stream")
    offset = struct.unpack("<I", content[10:14])[0]
    _, width, height, _, bpp = struct.unpack("<IiiHH", content[14:30])
    comp = struct.unpack("<I", content[30:34])[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    row_pad = (-(width * 3)) % 4
    bottom_up = height > 0
    height = abs(height)
    rows = []
    pos = offset
    for _ in range(height):
        row = []
        for _ in range(width):
            b, g, r = content[pos], content[pos + 1], content[pos + 2]
            row.append((r, g, b))
            pos += 3
        pos += row_pad
        rows.append(row)
    if bottom_up:
        rows.reverse()
    return width, height, [px for row in rows for px in row]


def _decode_real(content: bytes, modality: str) -> list[float]:
    """REAL decode/feature-extract for the formats a pure-stdlib parser
    can handle: RIFF/WAV audio (rate, n_samples, mean|amplitude|, peak)
    and 24-bit BMP images (width, height, mean intensity, peak). Video
    containers require an actual codec library (av/ffmpeg) absent from
    this container — that branch is the one remaining clearly-marked
    stub."""
    if content[:4] == b"RIFF":
        rate, samples = parse_wav(content)
        n = len(samples)
        mean_abs = sum(abs(s) for s in samples) / n if n else 0.0
        peak = float(max((abs(s) for s in samples), default=0))
        return [float(n), float(rate), mean_abs, peak]
    if content[:2] == b"BM":
        w, h, px = parse_bmp(content)
        flat = [c for p in px for c in p]
        mean_px = sum(flat) / len(flat) if flat else 0.0
        return [float(w), float(h), mean_px, float(max(flat, default=0))]
    raise NotImplementedError(
        "video/compressed media decode requires codec libraries "
        "(av/ffmpeg/PIL) not installed; WAV and BMP decode ARE real here"
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
    (``use_real_decode=True``) decodes 24-bit BMP with the stdlib parser,
    nearest-neighbor samples to width×height, and re-encodes BMP — an
    actual image resize, no codec libs. It REQUIRES every image-modality
    payload to be real BMP bytes (synth_media_table-style); any other
    payload — including build_media_table's fake text-byte payloads —
    raises ValueError mid-stage, by design (silently faking a resize of
    undecodable bytes would mask data corruption at scale). The default
    fake path (flag off) handles arbitrary payloads: it emits exactly
    width*height bytes cycled from the source so batch shapes, sizes, and
    types match the real path. Opt-in flag, not environment sniffing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            pdf = pdf[pdf["modality"] == "image"]
            if use_real_decode:
                resized = []
                for c in pdf["content"]:
                    sw, sh, px = parse_bmp(bytes(c))
                    resized.append(
                        make_bmp(
                            width,
                            height,
                            lambda x, y: px[
                                (y * sh // height) * sw + (x * sw // width)
                            ],
                        )
                    )
            else:
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


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode pipeline (rows-only): synthesize genuine WAV/BMP
    binaries (``synth_media_table``), then extract features with the
    stdlib parsers — audio rows carry (n_samples, rate, mean|amp|, peak),
    image rows (w, h, mean intensity, peak). Video is excluded here
    because its decode is the one honest stub left. This is the
    end-to-end path a real multimodal pipeline runs: binary column in,
    Arrow batch to Python, bytes → parsed media → features, Arrow back."""
    media = synth_media_table(spark, sf_dir).filter(
        F.col("modality") != "video"
    )
    return extract_features(media, use_real_decode=True)


def q_multimodal_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BMP resize pipeline (rows-only): 8×8 synthesized BMPs →
    nearest-neighbor 32×32 → re-encoded BMP payloads."""
    return resize_images(
        synth_media_table(spark, sf_dir), use_real_decode=True
    )


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
    "q_multimodal_decode": q_multimodal_decode,
    "q_multimodal_resize_real": q_multimodal_resize_real,
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
