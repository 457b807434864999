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
    """Batch decode → metadata DataFrame, vectorized: the 9-byte headers of
    the whole batch are gathered into ONE (n, 9) uint8 matrix and all field
    extraction (magic check, little-endian u16 width/height, u8 channels)
    runs as numpy column ops — no per-row struct.unpack, no per-row tuples.
    decoder='real' is the seam where PIL/libjpeg would plug in; unavailable
    in this container."""
    if decoder != "fake":
        raise NotImplementedError(
            "real image decoding requires PIL/libjpeg — not in this container; "
            "use decoder='fake' (pinned synthetic format)"
        )
    n = len(blobs)
    lens = np.fromiter(
        (0 if b is None else len(b) for b in blobs), dtype=np.int64, count=n
    )
    cand = lens >= 9
    width = np.zeros(n, dtype=np.int32)
    height = np.zeros(n, dtype=np.int32)
    channels = np.zeros(n, dtype=np.int32)
    valid = np.zeros(n, dtype=bool)
    if cand.any():
        hdr = np.frombuffer(
            b"".join(bytes(b[:9]) for b, c in zip(blobs, cand) if c),
            dtype=np.uint8,
        ).reshape(-1, 9)
        magic = np.frombuffer(_MAGIC, dtype=np.uint8)
        ok = (hdr[:, :4] == magic).all(axis=1)
        w = hdr[:, 4].astype(np.int32) | (hdr[:, 5].astype(np.int32) << 8)
        h = hdr[:, 6].astype(np.int32) | (hdr[:, 7].astype(np.int32) << 8)
        c = hdr[:, 8].astype(np.int32)
        valid[cand] = ok
        width[cand] = np.where(ok, w, 0)
        height[cand] = np.where(ok, h, 0)
        channels[cand] = np.where(ok, c, 0)
    return pd.DataFrame(
        {
            "width": width,
            "height": height,
            "channels": channels,
            "n_bytes": lens,
            "valid": valid,
        }
    )


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
            blobs = pdf[blob_col]
            meta = decode_image_batch(blobs)
            has_payload = meta["valid"].to_numpy() & (
                meta["n_bytes"].to_numpy() > 9
            )
            n = len(pdf)
            feats = np.zeros((n, 4), dtype=np.float64)
            if has_payload.any():
                # one concatenated payload buffer + reduceat segment stats —
                # vectorized over the whole batch, no per-row numpy calls
                payloads = [
                    bytes(b[9:]) for b, keep in zip(blobs, has_payload) if keep
                ]
                sizes = np.fromiter(map(len, payloads), dtype=np.int64)
                buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
                starts = np.zeros(len(sizes), dtype=np.int64)
                np.cumsum(sizes[:-1], out=starts[1:])
                f = buf.astype(np.float64)
                s1 = np.add.reduceat(f, starts)
                s2 = np.add.reduceat(f * f, starts)
                mean = s1 / sizes
                var = np.maximum(s2 / sizes - mean * mean, 0.0)
                mn = np.minimum.reduceat(buf, starts).astype(np.float64)
                mx = np.maximum.reduceat(buf, starts).astype(np.float64)
                feats[has_payload] = np.column_stack(
                    [mean, np.sqrt(var), mn, mx]
                )
            yield pd.DataFrame(
                {"item_id": pdf["item_id"], "feat": list(feats)}
            )

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
# driver-contract registration. The synthetic media table is a PURE FUNCTION
# of item_id (dims = 8+i%16 × 6+i%9 × 1+i%3, payload = byte ramp j%251,
# every 7th row corrupted, every 11th null), so BOTH the decoded metadata and
# the extracted features are re-derivable in plain SQL from range(64) — the
# oracle checks the full decode→extract pipeline value-exactly, not rows-only.
# ---------------------------------------------------------------------------

_BAD = "(i % 11 = 10 OR i % 7 = 6)"  # null blob OR corrupted magic


@q(
    "image_meta",
    f"SELECT CAST(i AS BIGINT) AS item_id, "
    f"CAST(CASE WHEN {_BAD} THEN 0 ELSE 8 + i % 16 END AS INTEGER) AS width, "
    f"CAST(CASE WHEN {_BAD} THEN 0 ELSE 6 + i % 9 END AS INTEGER) AS height, "
    f"CAST(CASE WHEN {_BAD} THEN 0 ELSE 1 + i % 3 END AS INTEGER) AS channels, "
    f"CAST(CASE WHEN i % 11 = 10 THEN 0 WHEN i % 7 = 6 THEN 20 "
    f"ELSE 9 + (8 + i % 16) * (6 + i % 9) * (1 + i % 3) END AS BIGINT) AS n_bytes, "
    f"NOT {_BAD} AS valid FROM range(64) t(i)",
)
def image_meta(spark, sf_dir):
    media = synthetic_media_df(spark, 64)
    return media.select("item_id", image_meta_udf("img").alias("m")).select(
        "item_id", "m.width", "m.height", "m.channels", "m.n_bytes", "m.valid"
    )


@q(
    "image_features",
    # closed-form stats of the byte ramp arange(n) % 251 (n = w*h*c): with
    # q = n // 251 full cycles and r = n % 251 remainder, sum = q*31375 +
    # r(r-1)/2 and sum-of-squares = q*5239625 + (r-1)r(2r-1)/6 — exact
    # integers, so sum/n and ssq/n - mean² are the IDENTICAL float64 ops the
    # Spark kernel performs (integer sums < 2^53 are exact in both engines)
    f"WITH items AS (SELECT i, CASE WHEN {_BAD} THEN 0 "
    "ELSE (8 + i % 16) * (6 + i % 9) * (1 + i % 3) END AS n FROM range(64) t(i)), "
    "c AS (SELECT i, n, n // 251 AS q, n % 251 AS r FROM items), "
    "s AS (SELECT i, n, "
    "CASE WHEN n = 0 THEN 0.0 ELSE (q*31375 + (r*(r-1))//2) * 1.0 / n END AS m, "
    "CASE WHEN n = 0 THEN 0.0 "
    "ELSE (q*5239625 + ((r-1)*r*(2*r-1))//6) * 1.0 / n END AS msq FROM c) "
    "SELECT CAST(i AS BIGINT) AS item_id, round(m, 4) AS f_mean, "
    "round(sqrt(greatest(msq - m * m, 0.0)), 4) AS f_std, 0.0 AS f_min, "
    "round(CASE WHEN n = 0 THEN 0.0 WHEN n >= 251 THEN 250.0 "
    "ELSE n - 1.0 END, 4) AS f_max FROM s",
)
def image_features(spark, sf_dir):
    """Feature-extraction plumbing as a first-class contract query: binary →
    fixed-width vector, batch-vectorized (the embedding-model batch shape)."""
    media = synthetic_media_df(spark, 64)
    feats = mean_pixel_features(media)
    return feats.select(
        "item_id",
        F.round(F.element_at("feat", 1), 4).alias("f_mean"),
        F.round(F.element_at("feat", 2), 4).alias("f_std"),
        F.round(F.element_at("feat", 3), 4).alias("f_min"),
        F.round(F.element_at("feat", 4), 4).alias("f_max"),
    )
