"""Pure-python XXH64 must be bit-identical to Spark's xxhash64 (the oracle
depends on it for url_hash tie-breaks). Pure part runs without Spark; the
Spark cross-check lives in test_spark_parity.py."""

from spiderspark.hashing import xxhash64_int


def test_known_lengths_stable():
    # Regression pins (values captured from Spark 4.1.2 F.xxhash64, seed 42).
    # If these move, the ordering fixtures are invalid.
    assert xxhash64_int("") == -7444071767201028348
    assert xxhash64_int("abc") == 1423657621850124518


def test_signed_range():
    for s in ["", "a", "zz", "x" * 100, "中文"]:
        h = xxhash64_int(s)
        assert -(2**63) <= h < 2**63


def test_bytes_str_equivalence():
    assert xxhash64_int("héllo") == xxhash64_int("héllo".encode("utf-8"))
