"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched kernels.

The Spark-side architecture is the real deliverable here and is fully
tested: binary payload + metadata struct schema, mapInPandas kernels
with explicit output schemas, partition-size control for memory-bounded
decode. The actual codec work is stubbed deterministically because this
environment has no image/audio libraries — each stub documents the
production swap (PIL/torchvision/ffmpeg) and raises or fakes in a
clearly-marked way.

At 100 TB: binary columns ride parquet fine (they're just byte arrays);
the rules that matter are (a) keep metadata in separate scalar columns
so pruning/filtering never touches the blobs, (b) decode in mapInPandas
with small maxRecordsPerBatch so executor memory is bounded by
batch_rows x max_asset_size, (c) emit features, never decoded rasters,
across shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Asset envelope: blob + scalar metadata (prunable without blob IO).
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def synthesize_assets(docs: DataFrame, modality_mod: int = 3) -> DataFrame:
    """Deterministic fake assets derived from the documents table —
    the test stand-in for an ingested binary corpus."""
    modality = (
        F.when(F.col("doc_id") % modality_mod == 0, "image")
        .when(F.col("doc_id") % modality_mod == 1, "audio")
        .otherwise("video")
    )
    content = F.encode(F.repeat(F.md5(F.col("text")), 8), "utf-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.concat(F.lit("application/x-fake-"), modality).alias("mime"),
        F.length(content).cast("long").alias("n_bytes"),
        content.alias("content"),
    )


IMAGE_FEATURES_SCHEMA = (
    "asset_id long, width int, height int, n_channels int, features array<float>"
)


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: decode image blobs -> dimensions + feature
    vector.

    STUB: no imaging library in this container. Production swap:
    ``PIL.Image.open(io.BytesIO(b))`` + a torchvision encoder. The fake
    derives deterministic dims/features from the bytes so the plumbing
    (schemas, batching, null handling) is fully exercised.
    """
    import hashlib

    def fake_decode(b: bytes | None):
        if b is None:
            return None
        h = hashlib.sha256(b).digest()
        width = 64 + h[0] % 192
        height = 64 + h[1] % 192
        feats = [((h[i] / 255.0) - 0.5) for i in range(16)]
        return width, height, 3, feats

    for pdf in batches:
        out = {"asset_id": [], "width": [], "height": [], "n_channels": [], "features": []}
        for aid, blob in zip(pdf["asset_id"], pdf["content"]):
            d = fake_decode(blob)
            out["asset_id"].append(aid)
            if d is None:
                out["width"].append(None)
                out["height"].append(None)
                out["n_channels"].append(None)
                out["features"].append(None)
            else:
                w, hgt, c, f = d
                out["width"].append(w)
                out["height"].append(hgt)
                out["n_channels"].append(c)
                out["features"].append(f)
        yield pd.DataFrame(out)


FRAME_SAMPLE_SCHEMA = "asset_id long, frame_idx int, frame_bytes binary"


def frame_sample_batch(n_frames: int = 4):
    """Kernel factory: sample N 'frames' from each video blob.

    STUB: production swap is ffmpeg/pyav keyframe extraction; the fake
    slices the blob into equal chunks (real plumbing: one input row ->
    many output rows through mapInPandas)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "frame_idx": [], "frame_bytes": []}
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                if blob is None:
                    continue
                step = max(1, len(blob) // n_frames)
                for i in range(n_frames):
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(i)
                    rows["frame_bytes"].append(bytes(blob[i * step : (i + 1) * step]))
            yield pd.DataFrame(rows)

    return kernel


def decode_audio_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel for audio: sample rate / duration / loudness.

    STUB: raises to mark the unimplemented codec path explicitly —
    production swap is soundfile/librosa. (Plumbing validated by the
    image/video kernels; this one demonstrates the hard-fail style.)
    """
    raise NotImplementedError(
        "audio decode requires soundfile/librosa (not in this container); "
        "swap this kernel body in production"
    )


def extract_image_features(assets: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Decode image assets into features, memory-bounded.

    Repartitioning by asset_id spreads blobs evenly; Arrow batch size
    caps peak decode memory at batch_rows x max_asset_bytes.
    """
    spark = assets.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))
    images = assets.filter(F.col("modality") == "image")
    return images.mapInPandas(decode_image_batch, schema=IMAGE_FEATURES_SCHEMA)


def sample_video_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    videos = assets.filter(F.col("modality") == "video")
    return videos.mapInPandas(frame_sample_batch(n_frames), schema=FRAME_SAMPLE_SCHEMA)
