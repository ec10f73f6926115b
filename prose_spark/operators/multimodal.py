"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

The decode kernels themselves are STUBBED in this environment (no
PIL/ffmpeg/torchaudio in the image): ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
fake decoder (seeded by the content hash) produces stable feature vectors
so the Spark-side plumbing — schema, partitioning, UDF signature, Arrow
batch shape — is real and tested end-to-end.

At 100 TB scale the relevant design points, all honored here:
- binary payloads stay OUT of shuffles: features are extracted in a
  map-only stage and only the (key, features, metadata) projection moves;
- `spark.sql.files.maxPartitionBytes` bounds scan partitions so a batch
  of blobs fits executor memory;
- per-batch decode amortizes library init (when a real decoder exists).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha1", T.StringType()),
    ]
)

IMAGE_FEATURES_TYPE = T.ArrayType(T.FloatType())
_FEATURE_DIM = 16


def decode_image(blob: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image blob to an HxWx3 array.

    STUB: real decoding needs an image library absent from this
    environment; ``fake=True`` derives a deterministic 8x8x3 array from
    the content hash (stable across runs/machines) for plumbing tests.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv, not available in this "
            "environment — pass fake=True for the deterministic test stub"
        )
    digest = hashlib.sha256(blob or b"").digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def _image_features(blob: bytes, fake: bool) -> list[float]:
    """Feature-extraction kernel: decode -> pooled features (stubbed
    decode; pooling math is real)."""
    img = decode_image(blob, fake=fake)
    flat = img.reshape(-1, 3).astype(np.float64)
    feats = np.concatenate(
        [
            flat.mean(axis=0) / 255.0,
            flat.std(axis=0) / 255.0,
            np.histogram(flat[:, 0], bins=10, range=(0, 256))[0] / flat.shape[0],
        ]
    )
    return [float(x) for x in feats[:_FEATURE_DIM]]


def extract_image_features(
    df: DataFrame,
    blob_col: str = "html",  # any binary column
    key_cols: tuple[str, ...] = ("url",),
    fake: bool = True,
) -> DataFrame:
    """Map-only feature extraction over binary media columns.

    -> key cols + media metadata struct + feature vector. The binary
    column is consumed inside the stage and never shuffled.
    """
    key_fields = [f for f in df.schema.fields if f.name in key_cols]
    out_schema = T.StructType(
        key_fields
        + [
            T.StructField("media_meta", MEDIA_META_TYPE),
            T.StructField("features", IMAGE_FEATURES_TYPE),
        ]
    )

    def run(batches):
        for pdf in batches:
            metas, feats = [], []
            for blob in pdf[blob_col]:
                b = bytes(blob) if blob is not None else b""
                metas.append(
                    {
                        "mime": "image/unknown",
                        "width": 8,
                        "height": 8,
                        "n_bytes": len(b),
                        "sha1": hashlib.sha1(b).hexdigest(),
                    }
                )
                feats.append(_image_features(b, fake))
            out = pdf[list(key_cols)].copy()
            out["media_meta"] = metas
            out["features"] = feats
            yield out

    return df.select(*key_cols, blob_col).mapInPandas(run, schema=out_schema)


def sample_video_frames(blob: bytes, every_n: int = 30, fake: bool = False):
    """Frame-sampling stub: yields deterministic fake frames when
    ``fake=True``; real implementation needs ffmpeg bindings."""
    if not fake:
        raise NotImplementedError(
            "video frame sampling requires ffmpeg, not available here — "
            "pass fake=True for the deterministic test stub"
        )
    digest = hashlib.sha256(blob or b"").digest()
    n_frames = 2 + digest[0] % 3
    for i in range(n_frames):
        frame_seed = hashlib.sha256(digest + i.to_bytes(2, "big")).digest()
        rng = np.random.default_rng(int.from_bytes(frame_seed[:8], "big"))
        yield rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
