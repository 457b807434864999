"""Pure-python XXH64 that is bit-identical to Spark's ``F.xxhash64``.

Spark's ``xxhash64(col)`` hashes a string column's UTF-8 bytes with the
XXH64 algorithm, seed 42, and returns the result as a *signed* 64-bit long
(org.apache.spark.sql.catalyst.expressions.XxHash64). The crawl-ordering
oracle (tests/oracle_crawler.py) needs the very same ``url_hash`` values the
engine computes JVM-side, so this module implements XXH64 from the public
algorithm spec (github.com/Cyan4973/xxHash — public domain spec).

``xxhash64_int(data, seed=42)`` is verified against Spark in
tests/test_hashing.py on a corpus of strings of every length class
(<8, 8–31, ≥32 bytes, empty, unicode).
"""

from __future__ import annotations

MASK64 = 0xFFFFFFFFFFFFFFFF

PRIME1 = 0x9E3779B185EBCA87
PRIME2 = 0xC2B2AE3D27D4EB4F
PRIME3 = 0x165667B19E3779F9
PRIME4 = 0x85EBCA77C2B2AE63
PRIME5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * PRIME2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * PRIME1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * PRIME1) + PRIME4) & MASK64


def xxhash64_int(data: bytes | str, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data`` as a SIGNED 64-bit int (matching Spark's LongType)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    idx = 0

    if n >= 32:
        v1 = (seed + PRIME1 + PRIME2) & MASK64
        v2 = (seed + PRIME2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - PRIME1) & MASK64
        limit = n - 32
        while idx <= limit:
            v1 = _round(v1, int.from_bytes(data[idx : idx + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[idx + 8 : idx + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[idx + 16 : idx + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[idx + 24 : idx + 32], "little"))
            idx += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + PRIME5) & MASK64

    h = (h + n) & MASK64

    while idx + 8 <= n:
        k1 = _round(0, int.from_bytes(data[idx : idx + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * PRIME1 + PRIME4) & MASK64
        idx += 8

    if idx + 4 <= n:
        h ^= (int.from_bytes(data[idx : idx + 4], "little") * PRIME1) & MASK64
        h = (_rotl(h, 23) * PRIME2 + PRIME3) & MASK64
        idx += 4

    while idx < n:
        h ^= (data[idx] * PRIME5) & MASK64
        h = (_rotl(h, 11) * PRIME1) & MASK64
        idx += 1

    h ^= h >> 33
    h = (h * PRIME2) & MASK64
    h ^= h >> 29
    h = (h * PRIME3) & MASK64
    h ^= h >> 32

    # Spark returns a signed long.
    return h - (1 << 64) if h >= (1 << 63) else h
