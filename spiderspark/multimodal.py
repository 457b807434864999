"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The decode kernels themselves are STUBBED (this container ships no
image/audio libraries — by design the Spark-side plumbing is what's real
and tested here): ``decode_image_batch`` raises ``NotImplementedError``
unless the deterministic fake decoder is selected, which parses the tiny
pinned header format the synthetic generator emits. Schema, partitioning,
UDF signatures and batch shapes are production-shaped; swapping in a real
decoder (PIL / torchaudio / pyav) changes ONE function.

Synthetic payload format (deterministic, seed-free):
  b"IMG1" + width:uint16 + height:uint16 + channels:uint8 + payload bytes
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .queries import q, _t

IMAGE_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("valid", T.BooleanType()),
    ]
)

_MAGIC = b"IMG1"
_HEADER = struct.Struct("<HHB")


def encode_fake_image(width: int, height: int, channels: int = 3) -> bytes:
    """Deterministic synthetic 'image': header + (w*h*c % 251) byte ramp."""
    n = width * height * channels
    payload = (np.arange(n, dtype=np.uint32) % 251).astype(np.uint8).tobytes()
    return _MAGIC + _HEADER.pack(width, height, channels) + payload


def decode_image_batch(blobs: pd.Series, decoder: str = "fake") -> pd.DataFrame:
    """Batch decode → metadata DataFrame. decoder='real' is the seam where
    PIL/libjpeg would plug in; unavailable in this container."""
    if decoder != "fake":
        raise NotImplementedError(
            "real image decoding requires PIL/libjpeg — not in this container; "
            "use decoder='fake' (pinned synthetic format)"
        )
    metas = []
    for b in blobs:
        if b is None or len(b) < 9 or bytes(b[:4]) != _MAGIC:
            metas.append((0, 0, 0, 0 if b is None else len(b), False))
            continue
        w, h, c = _HEADER.unpack(bytes(b[4:9]))
        metas.append((w, h, c, len(b), True))
    return pd.DataFrame(metas, columns=["width", "height", "channels", "n_bytes", "valid"])


@F.pandas_udf(IMAGE_META)
def image_meta_udf(blob: pd.Series) -> pd.DataFrame:
    return decode_image_batch(blob)


def mean_pixel_features(df: DataFrame, blob_col: str = "img") -> DataFrame:
    """Feature-extraction shape: binary → fixed-width float vector via
    mapInPandas (the batch shape a real embedding model would use)."""
    out_schema = T.StructType(
        [
            T.StructField("item_id", T.LongType()),
            T.StructField("feat", T.ArrayType(T.DoubleType())),
        ]
    )

    def extract(batches):
        for pdf in batches:
            feats = []
            for b in pdf[blob_col]:
                if b is None or len(b) < 9 or bytes(b[:4]) != _MAGIC:
                    feats.append([0.0, 0.0, 0.0, 0.0])
                    continue
                arr = np.frombuffer(bytes(b[9:]), dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0, 0.0, 0.0, 0.0])
                    continue
                feats.append(
                    [
                        float(arr.mean()),
                        float(arr.std()),
                        float(arr.min()),
                        float(arr.max()),
                    ]
                )
            yield pd.DataFrame({"item_id": pdf["item_id"], "feat": feats})

    return df.mapInPandas(extract, schema=out_schema)


def synthetic_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic media table for tests/queries: item_id, img binary,
    every 7th row corrupted, every 11th null — exercises the error paths."""
    rows = []
    for i in range(n):
        if i % 11 == 10:
            blob = None
        elif i % 7 == 6:
            blob = b"JUNK" + bytes([i % 256]) * 16
        else:
            blob = encode_fake_image(8 + i % 16, 6 + i % 9, 1 + i % 3)
        rows.append((i, blob))
    return spark.createDataFrame(
        rows, T.StructType([
            T.StructField("item_id", T.LongType()),
            T.StructField("img", T.BinaryType()),
        ])
    )


# ---------------------------------------------------------------------------
# driver-contract registration: metadata extraction is integer-exact, so it
# gets a real DuckDB oracle by re-deriving meta from the pinned format in SQL
# is impractical — instead the oracle checks the derived stats via documents
# (rows-only for the media table itself).
# ---------------------------------------------------------------------------


@q("image_meta")  # rows-only: synthetic media table is engine-generated
def image_meta(spark, sf_dir):
    media = synthetic_media_df(spark, 64)
    return media.select("item_id", image_meta_udf("img").alias("m")).select(
        "item_id", "m.width", "m.height", "m.channels", "m.n_bytes", "m.valid"
    )
