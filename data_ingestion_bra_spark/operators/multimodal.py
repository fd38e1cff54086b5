"""Multimodal column operators: opaque binary payloads + typed metadata.

Schema pattern: ``struct<payload: binary, meta: struct<...typed fields>>``
(or flat ``payload``/metadata columns). The payload stays opaque to the
engine — metadata drives filtering/partitioning (so Catalyst prunes scans
without touching bytes), and decode/feature steps run in Arrow-batched
``mapInPandas`` so payload bytes cross the JVM↔Python boundary in columnar
batches, never row-at-a-time.

The actual image/audio decode libraries are NOT in this container, so
``decode_image_batch`` ships a deterministic fake decoder behind the same
batch signature (documented stub per the build brief); the Spark-side
plumbing — schema, batch shape, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        # mean byte intensity scaled by 1e6, floor-divided — integer-exact,
        # so a SQL oracle reproduces it without float-rounding hazards
        T.StructField("mean_intensity_e6", T.LongType()),
    ]
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fixture adapter: treat each document's UTF-8 bytes as an opaque
    payload column (stands in for image/audio bytes in the test corpus)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.length(F.encode(F.col(text_col), "UTF-8")).cast("bigint").alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for an image decoder.

    A real deployment plugs PIL/ffmpeg here (same signature); this derives
    stable pseudo-dimensions and a mean-intensity proxy from the bytes so
    tests have exact expectations. Raises on empty payloads the way a real
    decoder raises on corrupt files.
    """
    if not payload:
        raise ValueError("empty payload: cannot decode")
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    channels = 3
    m = min(n, 256)
    mean_intensity_e6 = (sum(payload[:m]) * 1_000_000) // (m * 255)
    return width, height, channels, mean_intensity_e6


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batches in, decoded-metadata batches out.

    Batch shape contract: input columns (doc_id, payload[, n_bytes]);
    output matches DECODED_META_SCHEMA. Per-batch vectorized loop (not
    per-row UDF calls) — the pattern that holds at 100 TB where each batch
    is thousands of payloads.
    """
    for pdf in batches:
        dims = [_fake_decode(bytes(p)) for p in pdf["payload"]]
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "channels": [d[2] for d in dims],
                "mean_intensity_e6": [d[3] for d in dims],
            }
        )
        yield out


def decode_images(df: DataFrame) -> DataFrame:
    """Decode/feature-extract an opaque payload column via mapInPandas."""
    return df.mapInPandas(decode_image_batch, schema=DECODED_META_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("scale_e6", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_batch_fn(target_w: int, target_h: int):
    """mapInPandas worker factory for the resize step.

    The real implementation calls PIL's resize per batch; the stub keeps the
    contract observable: output dims are the target, the scale factor is
    recorded (fixed-point), and the 'resized payload' is a deterministic
    truncation/padding of the input bytes to target_w*target_h (so tests can
    assert exact output sizes — the property that matters for batch shape).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = target_w * target_h
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            for p in payloads:
                if not p:
                    raise ValueError("empty payload: cannot resize")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": target_w,
                    "height": target_h,
                    "scale_e6": [(n_out * 1_000_000) // len(p) for p in payloads],
                    "payload": [
                        (p * (n_out // len(p) + 1))[:n_out] for p in payloads
                    ],
                }
            )

    return fn


def resize_images(df: DataFrame, *, width: int, height: int) -> DataFrame:
    """Resize an opaque payload column via mapInPandas (stubbed resampler;
    real deployments swap in PIL — identical batch contract)."""
    return df.mapInPandas(resize_batch_fn(width, height), schema=RESIZED_SCHEMA)


def frame_sample_plan(df: DataFrame, *, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index, derived WITHOUT decoding (index arithmetic on metadata), so the
    expensive decode only runs on sampled frames downstream.

    Stub semantics: n_frames := n_bytes // 256 (a real impl reads container
    metadata); emits (doc_id, frame_idx) for every ``every_n``-th frame.
    """
    return df.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest((F.col("n_bytes") / F.lit(256)).cast("bigint") - 1, F.lit(0)), F.lit(every_n)
            )
        ).alias("frame_idx"),
    )
