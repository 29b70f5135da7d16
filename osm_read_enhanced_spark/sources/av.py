"""Deterministic synthetic video/audio tables (multimodal A/V legs).

Same distributed one-Arrow-batch-per-task generation as the images
table (``sources/images.py``): payloads are real container bytes
(functions/av.py formats), metadata columns are typed — the
``binary column + typed metadata`` shape the build brief mandates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions import av
from .images import render_image

VIDEOS_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("fps", T.IntegerType(), False),
    ]
)

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
    ]
)


def render_video(idx: int, n_frames: int = 8, w: int = 32, h: int = 32) -> np.ndarray:
    """(n_frames, h, w, 3) — frame f of video idx is the deterministic
    image render of seed idx*1000 + f (shares the image generator)."""
    return np.stack([render_image(idx * 1000 + f, w, h) for f in range(n_frames)])


def tone_params(idx: int) -> tuple[float, float]:
    """(frequency_hz, amplitude) for clip idx — pure integer-derived."""
    return 200.0 + (idx * 37) % 1800, 3000.0 + (idx * 911) % 12000


def render_tone(idx: int, sample_rate: int = 8000, n_samples: int = 4096) -> np.ndarray:
    """Pure sine int16 clip — analytically anchorable: RMS ≈ A/√2,
    ZCR ≈ 2f/sr, spectral centroid ≈ f."""
    f, a = tone_params(idx)
    t = np.arange(n_samples, dtype=np.float64) / sample_rate
    return np.round(a * np.sin(2 * np.pi * f * t)).astype(np.int16)


def build_videos_df(
    spark: SparkSession, n: int, n_frames: int = 8, w: int = 32, h: int = 32,
    partitions: int | None = None,
) -> DataFrame:
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    def gen(it):
        for pdf in it:
            rows = []
            for idx in pdf["id"]:
                idx = int(idx)
                frames = render_video(idx, n_frames, w, h)
                rows.append(
                    (
                        f"vid_{idx:08d}",
                        bytearray(av.encode_video(frames, fps=10)),
                        w, h, n_frames, 10,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["video_id", "bytes", "w", "h", "n_frames", "fps"]
            )

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, VIDEOS_SCHEMA)


def build_audio_df(
    spark: SparkSession, n: int, sample_rate: int = 8000, n_samples: int = 4096,
    partitions: int | None = None,
) -> DataFrame:
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    def gen(it):
        for pdf in it:
            rows = []
            for idx in pdf["id"]:
                idx = int(idx)
                pcm = render_tone(idx, sample_rate, n_samples)
                rows.append(
                    (
                        f"clip_{idx:08d}",
                        bytearray(av.encode_wav(pcm, sample_rate)),
                        sample_rate,
                        n_samples,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["clip_id", "bytes", "sample_rate", "n_samples"]
            )

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, AUDIO_SCHEMA)
