"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The container has no decode libraries (PIL/ffmpeg), so the DECODE step is
stubbed behind `decode_available()` with a deterministic fake; everything
Spark-side — schema, partition sizing, Arrow batch shape, mapInPandas
signatures — is real and tested.

Scale notes: binary payloads ride in their own column so column pruning
drops them unless a stage touches them; decode/feature stages run as
mapInPandas with small `maxRecordsPerBatch` (payloads are MBs, not KBs —
the default 10k-row Arrow batch would OOM). Sizing guidance:
spark.sql.execution.arrow.maxRecordsPerBatch ≈ 64 for images, lower for
video; spark.sql.files.maxPartitionBytes stays default because binary
sources split per file.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

IMAGE_FEATURES_SCHEMA = (
    "asset_id string, modality string, width int, height int, features array<float>"
)


def decode_available() -> bool:
    """True when a real image decoder is importable. In this container it
    is not; pipelines fall back to the deterministic fake so the Spark
    plumbing stays exercised end-to-end."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for decode+feature-extract: derives a fake
    (width, height) and a FEATURE_DIM float vector from the sha256 of the
    payload. Stable across runs/executors; unit tests assert on it."""
    if payload is None:
        return 0, 0, [0.0] * FEATURE_DIM
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    feats = [round(b / 255.0, 6) for b in digest[:FEATURE_DIM]]
    return width, height, feats


def extract_image_features(assets: DataFrame) -> DataFrame:
    """assets (ASSETS_SCHEMA) -> per-asset feature rows via mapInPandas.

    Real decode raises NotImplementedError until a decoder ships; the fake
    path keeps batch shapes / schema / partitioning production-shaped.
    """
    if decode_available():  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "real decode path: plug PIL/torchvision here; the mapInPandas "
            "harness below is decoder-agnostic"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "features": [d[2] for d in decoded],
                }
            )

    return assets.mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(assets: DataFrame, every_n: int = 10, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video assets: emits (asset_id,
    frame_idx) rows — the decode of each frame is the stubbed step. The
    explode happens JVM-side so a 2-hour video row fans out without
    touching Python."""
    n_frames = F.coalesce(F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0))
    last = F.least(F.floor((n_frames - 1) / every_n).cast("int"), F.lit(max_frames - 1))
    idx = F.sequence(F.lit(0), last)
    return (
        # videos with zero/unknown frame counts emit nothing (Spark's
        # sequence(0,-1) would yield [0,-1], not an empty array)
        assets.filter((F.col("modality") == "video") & (n_frames > 0))
        .select("asset_id", F.explode(F.transform(idx, lambda i: i * every_n)).alias("frame_idx"))
    )


def resize_stub(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through mapInPandas batches with a
    deterministic 'resized' marker in meta (real resize = decoder work).
    Schema/partition behavior identical to a real resize."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["meta"] = [
                {**(m or {}), "resized": f"{width}x{height}"} for m in pdf["meta"]
            ]
            yield pdf

    return assets.mapInPandas(batches, schema=assets.schema)
