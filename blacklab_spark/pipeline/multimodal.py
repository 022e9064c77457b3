"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libs in this container):
`decode_image` raises NotImplementedError unless `fake=True`, which
substitutes a deterministic fake decoder so the Spark-side plumbing —
schema, batch shape, partitioning, UDF signature — is real and tested.

Scale notes: binary payloads stay in Arrow record batches end-to-end
(zero-copy into pandas); `mapInPandas` streams batches so one task
never materializes a partition of blobs; feature outputs are small
fixed-width columns, so the downstream shuffle moves features, not
media bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, feat array<float>, feat_dim int, payload_sha string"


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded pseudo-random
    bytes; metadata typed as a real pipeline would carry it."""
    rows = []
    for i in range(n):
        h = hashlib.sha256(f"{seed}|{i}".encode()).digest()
        payload = (h * ((512 + len(h) - 1) // len(h)))[: 256 + (i % 512)]
        kind = ("image", "audio", "video")[i % 3]
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 128 if kind != "audio" else None,
                48 + i % 96 if kind != "audio" else None,
                1000 + i * 10 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: hash-seeded feature
    vector. Replace with PIL/torchaudio/ffmpeg decode in production."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw / 2**32).astype(np.float32) - 0.5


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real decoder entry point. The container ships no imaging libs;
    production deployments swap this for PIL.Image.open + resize."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv — not available in this "
        "container; use extract_features(..., fake=True) for plumbing tests"
    )


def extract_features(media: DataFrame, dim: int = 16, fake: bool = True,
                     batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Streams record batches through a pandas iterator UDF; each batch
    yields (media_id, feat, feat_dim, payload_sha). With fake=False it
    calls decode_image and (by design, in this container) raises."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas = [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                shas.append(hashlib.sha256(b).hexdigest())
                if fake:
                    feats.append(_fake_decode(b, dim))
                else:
                    feats.append(decode_image(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "feat": feats,
                    "feat_dim": dim,
                    "payload_sha": shas,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plan: one row per frame to decode — the
    JVM-side explode that precedes a (stubbed) decode. Shows the
    partitioning story: frames of one video stay in one task."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
