"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step itself is STUBBED — codec libraries (Pillow, ffmpeg,
torchaudio) are not in this image — but everything Spark-side is real and
tested: the schema, the Arrow batch shape through ``mapInPandas``, the
partitioning of heavy binary rows, and the metadata extraction that parses
tiny deterministic headers without decoding payloads.

``set_decoder`` swaps the stub for a real codec at deployment; the pipeline
shape (scan -> mapInPandas batches -> feature columns) is unchanged.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image|audio|video
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),     # image/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),  # audio/video
        T.StructField("payload", T.BinaryType(), False),
    ]
)

_MAGIC = b"NIDO"


def _synth_media_row(i: int, seed: int) -> tuple:
    """One deterministic media row from (seed, media_id) — shared by the
    distributed generator and the driver-side oracle rendering."""
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
    rng = np.random.default_rng([seed, int(i)])
    kind = kinds[int(i) % 3]
    w = int(rng.integers(16, 512)) if kind != "audio" else None
    h = int(rng.integers(16, 512)) if kind != "audio" else None
    dur = int(rng.integers(100, 60_000)) if kind != "image" else None
    header = (
        _MAGIC
        + int(w or 0).to_bytes(4, "big")
        + int(h or 0).to_bytes(4, "big")
        + int(dur or 0).to_bytes(4, "big")
    )
    body = rng.integers(0, 256, size=int(rng.integers(64, 1024)), dtype=np.uint8).tobytes()
    return (int(i), kind, mimes[kind], w, h, dur, header + body)


def synth_media(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Deterministic fake media table: payload = 4-byte magic + 12-byte
    header (w, h, duration) + pseudorandom body. Lets every pipeline stage
    downstream of decode run for real."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_synth_media_row(int(i), seed) for i in pdf["id"].to_numpy()]
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "mime", "width", "height", "duration_ms", "payload"]
            )

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synth_media_pandas(n: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side rendering of synth_media (identical rows, no Spark) —
    lets the oracle SQL embed the fixture as VALUES and independently
    re-derive header parses / feature statistics in DuckDB."""
    return pd.DataFrame(
        [_synth_media_row(i, seed) for i in range(n)],
        columns=["media_id", "kind", "mime", "width", "height", "duration_ms", "payload"],
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-SQL metadata aggregation — no payload decode, column pruning
    keeps the binary column out of the scan entirely."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("width").alias("avg_width"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )


def parse_headers(media: DataFrame) -> DataFrame:
    """Extract (w, h, duration) from the payload header bytes without
    decoding the body — substring on binary stays JVM-side."""
    hdr_ok = F.substring("payload", 1, 4) == F.lit(_MAGIC)
    def be_int(start):  # 4-byte big-endian int from binary substring
        return (
            F.conv(F.hex(F.substring("payload", start, 4)), 16, 10).cast("long")
        )
    return media.select(
        "media_id",
        "kind",
        hdr_ok.alias("header_valid"),
        be_int(5).cast("int").alias("hdr_width"),
        be_int(9).cast("int").alias("hdr_height"),
        be_int(13).cast("int").alias("hdr_duration_ms"),
        F.length("payload").alias("payload_bytes"),
    )


def sample_frames(media: DataFrame, every_ms: int = 5000, frame_bytes: int = 16) -> DataFrame:
    """(media_id, kind, frame_idx, ts_ms, frame_hex) — frame-sampling
    plumbing for audio/video rows, entirely JVM-side: the header-parsed
    duration decides the frame count (one per ``every_ms``, capped by the
    body length), and each frame is a ``frame_bytes`` slice of the payload
    body at a deterministic offset. A real deployment replaces the slice
    with an ffmpeg keyframe fetch; the schema, explode shape and
    partitioning are what the pipeline needs either way. Images produce no
    frames."""
    dur = F.conv(F.hex(F.substring("payload", 13, 4)), 16, 10).cast("long")
    body_len = (F.length("payload") - 16).cast("long")
    n_frames = F.least(
        F.floor(dur / every_ms) + 1, F.floor(body_len / frame_bytes)
    ).cast("int")
    return (
        media.where(F.col("kind") != "image")
        .select("media_id", "kind", n_frames.alias("n"), "payload")
        .where(F.col("n") >= 1)
        .select(
            "media_id",
            "kind",
            F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("frame_idx"),
            "payload",
        )
        .select(
            "media_id",
            "kind",
            "frame_idx",
            (F.col("frame_idx").cast("long") * every_ms).alias("ts_ms"),
            F.hex(
                F.substring(
                    "payload",
                    F.lit(17) + F.col("frame_idx") * frame_bytes,
                    F.lit(frame_bytes),
                )
            ).alias("frame_hex"),
        )
    )


def resize_media(media: DataFrame, thumb_w: int = 8, thumb_h: int = 8) -> DataFrame:
    """(media_id, kind, thumb_w, thumb_h, thumb_hex) — thumbnail/resize
    plumbing via mapInPandas: decode stub -> integer-stride downsample of
    the body to thumb_w*thumb_h samples -> hex. The stride uses pure
    integer arithmetic (idx_i = i*(n-1) // (k-1)), so any engine reproduces
    the exact bytes; a real deployment swaps the sampler for
    PIL.Image.resize behind the same schema."""
    k = max(thumb_w * thumb_h, 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for payload in pdf["payload"]:
                body = np.frombuffer(bytes(payload)[16:], dtype=np.uint8)
                n = len(body)
                if n == 0:
                    thumbs.append("")
                    continue
                if k == 1:
                    idx = [0]
                else:
                    idx = [(i * (n - 1)) // (k - 1) for i in range(k)]
                thumbs.append(body[idx].tobytes().hex().upper())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "thumb_w": thumb_w,
                    "thumb_h": thumb_h,
                    "thumb_hex": thumbs,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id long, kind string, thumb_w int, thumb_h int, thumb_hex string"
    )


# --- decode / feature extraction (stub-gated) -------------------------------

_DECODER: Callable[[bytes, str], np.ndarray] | None = None


def set_decoder(fn: Callable[[bytes, str], np.ndarray]) -> None:
    """Install a real codec: fn(payload, kind) -> np.ndarray features."""
    global _DECODER
    _DECODER = fn


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic decode stand-in: 8 features from byte statistics.
    A real deployment replaces this via set_decoder (PIL/ffmpeg).

    Every feature is an exact-integer sum divided by an exact-integer count
    (no incremental mean/variance), so any engine recomputing it from the
    same bytes produces bit-identical doubles — that is what lets the
    driver's DuckDB oracle value-check the full mapInPandas pipeline."""
    arr = np.frombuffer(payload[16:], dtype=np.uint8).astype(np.float64)
    if len(arr) == 0:
        return np.zeros(8)
    n = float(len(arr))
    head = min(32, len(arr))
    return np.array(
        [
            arr.sum() / n,                      # mean (exact int sum / n)
            (arr * arr).sum() / n,              # mean of squares
            arr.min(), arr.max(), n,
            arr[:32].sum() / head,              # head mean
            arr[-32:].sum() / head,             # tail mean
            float(np.count_nonzero(arr > 127)) / n,
        ]
    )


FEATURE_SCHEMA = "media_id long, kind string, features array<double>"


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """(media_id, kind, features) via mapInPandas. Real decoders raise
    NotImplementedError here until installed with set_decoder; the fake
    decoder keeps the full pipeline runnable/testable."""
    decoder = _DECODER or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [f.tolist() for f in feats],
                }
            )

    # heavy binary rows: repartition so a partition's Arrow batches stay
    # small regardless of upstream file layout
    return media.select("media_id", "kind", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def real_decoder_stub(payload: bytes, kind: str) -> np.ndarray:
    """The deployment hook: replace with PIL.Image.open / soundfile / ffmpeg
    frame sampling. Kept as an explicit NotImplementedError so the gap is
    visible, per the build brief."""
    raise NotImplementedError(
        "codec libraries are not available in this environment; "
        "install one and register it with multimodal.set_decoder"
    )
