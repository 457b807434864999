"""Bloom-filter sketches for the distributed URL-seen set.

BASELINE.json:6 mandates "a distributed URL-seen set built as per-partition
Bloom/cuckoo filters merged via treeAggregate". Design (SURVEY.md §2.4 A4,
§7.5.6):

- Keys are the engine's 64-bit ``url_hash`` values (Spark ``xxhash64`` of the
  canonical URL), so the sketch never re-hashes strings: index derivation is
  pure integer mixing, fully vectorized in numpy.
- Double hashing (Kirsch–Mitzenmacher): position_i = (h1 + i·h2) mod m with
  h1 = mix(key), h2 = odd mix(key) — k positions from one 64-bit key, the
  standard public construction.
- At 10^10 keys / 1% fpp a single filter would need ~12 GB of bits
  (m = -n·ln p / ln²2 ≈ 9.6e10 bits). That cannot live in one executor, so
  the scale design is BUCKETED: ``bucket = pmod(url_hash, n_buckets)`` and an
  independent filter per bucket; membership tests route each key to its
  bucket's bits. Buckets are built per Spark partition (partition key IS the
  bucket) and merged via bitwise OR — associative + commutative, hence safe
  for ``treeAggregate``'s arbitrary combine order.
- Bloom (not cuckoo) is the primary tier: the dedup contract needs *zero
  false negatives* (a false negative would re-crawl forever); bloom gives
  that unconditionally, cuckoo only without deletions under load limits.
  False positives are safe: the "maybe-seen" subset falls through to the
  exact anti-join tier (SURVEY.md §2.3 J1/J2).
"""

from __future__ import annotations

import math

import numpy as np

_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _as_u64(keys) -> np.ndarray:
    return np.asarray(keys, dtype=np.int64).view(np.uint64)


def _mix(x: np.ndarray) -> np.ndarray:
    # splitmix64 finalizer — public-domain construction (Vigna).
    x = (x ^ (x >> np.uint64(30))) * _MIX1
    x = (x ^ (x >> np.uint64(27))) * _MIX2
    return x ^ (x >> np.uint64(31))


def optimal_params(n_items: int, fpp: float) -> tuple[int, int]:
    """(n_bits, n_hashes) for a target capacity and false-positive rate."""
    n_items = max(1, n_items)
    m = int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 63) // 64 * 64)
    k = max(1, round(m / n_items * math.log(2)))
    return m, int(k)


class Bloom:
    """A single Bloom filter over int64 keys; bits in a uint64 numpy array."""

    __slots__ = ("n_bits", "n_hashes", "words")

    def __init__(self, n_bits: int, n_hashes: int, words: np.ndarray | None = None):
        assert n_bits % 64 == 0 and n_bits > 0
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.words = (
            np.zeros(n_bits // 64, dtype=np.uint64) if words is None else words
        )

    @classmethod
    def for_capacity(cls, n_items: int, fpp: float = 0.01) -> "Bloom":
        return cls(*optimal_params(n_items, fpp))

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        u = _as_u64(keys)
        h1 = _mix(u)
        h2 = _mix(u ^ _GOLDEN) | np.uint64(1)
        i = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) % np.uint64(self.n_bits)

    _CHUNK = 65536  # keep the positions temp in L3 — bitwise_or.at over a
    # huge scattered index array is ~20× slower than chunked (measured)

    def add(self, keys) -> "Bloom":
        keys = np.asarray(keys, dtype=np.int64)
        for i in range(0, keys.size, self._CHUNK):
            pos = self._positions(keys[i : i + self._CHUNK]).ravel()
            np.bitwise_or.at(
                self.words, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        return self

    def contains(self, keys) -> np.ndarray:
        """Vectorized membership: bool array, no false negatives."""
        pos = self._positions(keys)
        word = self.words[(pos >> np.uint64(6)).astype(np.int64)]
        bit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return bit.all(axis=0)

    def merge(self, other: "Bloom") -> "Bloom":
        assert self.n_bits == other.n_bits and self.n_hashes == other.n_hashes
        self.words |= other.words
        return self

    def to_bytes(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes, n_bits: int, n_hashes: int) -> "Bloom":
        words = np.frombuffer(raw, dtype=np.uint64).copy()
        assert words.size * 64 == n_bits
        return cls(n_bits, n_hashes, words)

    @property
    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.words.view(np.uint8)).mean())


class CuckooFilter:
    """Partial-key cuckoo filter over int64 keys (Fan et al., CoNEXT 2014 —
    public construction): b buckets × 4 slots of 16-bit fingerprints;
    candidate buckets i1 = hash(key), i2 = i1 ^ hash(fingerprint).

    Role in the engine (BASELINE.json names "Bloom/cuckoo"): the cuckoo
    tier SUPPORTS DELETION and ~same space at 3% fpp, but an insert can
    FAIL under load (eviction loop exhausted) — a failed insert that is
    ignored would be a FALSE NEGATIVE, which re-crawls a URL forever. The
    crawl loop therefore defaults to Bloom (unconditionally zero false
    negatives); CuckooFilter is provided behind the same bytes-roundtrip
    seam for deployments that need removals (e.g. re-crawl-after-TTL), with
    ``add`` RAISING on overflow so the caller resizes instead of silently
    dropping keys. Lookup and bulk-add bucket math are numpy-vectorized;
    the eviction walk is per-colliding-key by nature of the algorithm.
    """

    __slots__ = ("n_buckets", "slots", "max_kicks")

    SLOTS_PER_BUCKET = 4

    def __init__(self, n_buckets: int, max_kicks: int = 500):
        # power-of-two buckets so i2 = i1 ^ fp_hash stays in range
        assert n_buckets > 0 and (n_buckets & (n_buckets - 1)) == 0
        self.n_buckets = n_buckets
        self.slots = np.zeros((n_buckets, self.SLOTS_PER_BUCKET), dtype=np.uint16)
        self.max_kicks = max_kicks

    @classmethod
    def for_capacity(cls, n_items: int) -> "CuckooFilter":
        # 95% load is the published safe bound for 4-slot buckets; headroom
        target = max(8, int(n_items / (cls.SLOTS_PER_BUCKET * 0.84)))
        return cls(1 << (target - 1).bit_length())

    def _fp_and_buckets(self, keys) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        u = _as_u64(keys)
        h = _mix(u)
        fp = (h & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 marks an empty slot
        mask = np.uint64(self.n_buckets - 1)
        i1 = ((h >> np.uint64(16)) & mask).astype(np.int64)
        alt = _mix(fp.astype(np.uint64)) & mask
        i2 = (i1 ^ alt.astype(np.int64)) & int(mask)
        return fp, i1, i2

    def _alt_bucket(self, fp: int, i: int) -> int:
        alt = int(_mix(np.uint64(fp)) & np.uint64(self.n_buckets - 1))
        return (i ^ alt) & (self.n_buckets - 1)

    def add(self, keys) -> "CuckooFilter":
        with np.errstate(over="ignore"):  # uint64 wraparound is the intent
            return self._add(keys)

    def _add(self, keys) -> "CuckooFilter":
        fp, i1, i2 = self._fp_and_buckets(keys)
        rng_state = np.uint64(0x9E3779B97F4A7C15)
        for j in range(len(fp)):
            f, a, b = int(fp[j]), int(i1[j]), int(i2[j])
            # already present (either candidate bucket) → idempotent
            if (self.slots[a] == f).any() or (self.slots[b] == f).any():
                continue
            placed = False
            for bucket in (a, b):
                empty = np.nonzero(self.slots[bucket] == 0)[0]
                if len(empty):
                    self.slots[bucket, empty[0]] = f
                    placed = True
                    break
            if placed:
                continue
            # eviction walk (deterministic slot choice: splitmix stream);
            # the walk is recorded so a failed insert can be rolled back —
            # without the rollback the displaced chain would leave the
            # filter with a FALSE NEGATIVE for a previously-added key
            cur, cur_fp = a, f
            walk: list[tuple[int, int]] = []
            for kick in range(self.max_kicks):
                rng_state = _mix(rng_state + _GOLDEN)
                slot = int(rng_state & np.uint64(self.SLOTS_PER_BUCKET - 1))
                walk.append((cur, slot))
                cur_fp, self.slots[cur, slot] = (
                    int(self.slots[cur, slot]),
                    cur_fp,
                )
                cur = self._alt_bucket(cur_fp, cur)
                empty = np.nonzero(self.slots[cur] == 0)[0]
                if len(empty):
                    self.slots[cur, empty[0]] = cur_fp
                    break
            else:
                # undo the displacement chain (reverse swaps restore every
                # evicted fingerprint to its original slot; cur_fp ends as
                # the in-hand key, which is simply not inserted). The filter
                # is left EXACTLY as before this key's insert — keys added
                # earlier in the batch remain present and queryable.
                for bucket, slot in reversed(walk):
                    cur_fp, self.slots[bucket, slot] = (
                        int(self.slots[bucket, slot]),
                        cur_fp,
                    )
                raise OverflowError(
                    "cuckoo filter full — resize (rebuild at 2× buckets "
                    "from the original keys) before adding; the failed "
                    "insert was rolled back, so membership of all "
                    "previously-added keys is intact (a silent drop would "
                    "be a false negative, which the URL-seen contract "
                    "forbids)"
                )
        return self

    def contains(self, keys) -> np.ndarray:
        """Vectorized: both candidate buckets of every key checked at once."""
        fp, i1, i2 = self._fp_and_buckets(keys)
        in1 = (self.slots[i1] == fp[:, None]).any(axis=1)
        in2 = (self.slots[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def delete(self, keys) -> np.ndarray:
        """Remove one fingerprint copy per present key; returns per-key
        'was present' bools (the capability Bloom lacks)."""
        fp, i1, i2 = self._fp_and_buckets(keys)
        out = np.zeros(len(fp), dtype=bool)
        for j in range(len(fp)):
            f = int(fp[j])
            for bucket in (int(i1[j]), int(i2[j])):
                hit = np.nonzero(self.slots[bucket] == f)[0]
                if len(hit):
                    self.slots[bucket, hit[0]] = 0
                    out[j] = True
                    break
        return out

    def to_bytes(self) -> bytes:
        return self.slots.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes, n_buckets: int) -> "CuckooFilter":
        out = cls(n_buckets)
        out.slots = (
            np.frombuffer(raw, dtype=np.uint16)
            .reshape(n_buckets, cls.SLOTS_PER_BUCKET)
            .copy()
        )
        return out

    @property
    def load_factor(self) -> float:
        return float((self.slots != 0).mean())


class BucketedBloom:
    """n_buckets independent Blooms; key routing = key mod n_buckets.

    Mirrors the physical layout at 10^10 scale: one bucket per frontier
    partition, each bucket's bits sized for n_items/n_buckets keys, so no
    single executor or broadcast ever holds the full 12 GB — only its
    bucket's slice. In-sandbox all buckets fit in one process; the routing
    math is identical.
    """

    __slots__ = ("n_buckets", "n_bits", "n_hashes", "filters")

    def __init__(self, n_buckets: int, n_bits: int, n_hashes: int):
        self.n_buckets = n_buckets
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.filters = [Bloom(n_bits, n_hashes) for _ in range(n_buckets)]

    @classmethod
    def for_capacity(
        cls, n_items: int, n_buckets: int, fpp: float = 0.01
    ) -> "BucketedBloom":
        n_bits, n_hashes = optimal_params(
            max(1, n_items // max(1, n_buckets)), fpp
        )
        return cls(n_buckets, n_bits, n_hashes)

    def bucket_of(self, keys) -> np.ndarray:
        # Same semantics as Spark's pmod(url_hash, n_buckets): non-negative.
        k = np.asarray(keys, dtype=np.int64)
        return np.mod(k, self.n_buckets).astype(np.int64)

    def add(self, keys) -> "BucketedBloom":
        k = np.asarray(keys, dtype=np.int64)
        b = self.bucket_of(k)
        for bucket in np.unique(b):
            self.filters[int(bucket)].add(k[b == bucket])
        return self

    def contains(self, keys) -> np.ndarray:
        k = np.asarray(keys, dtype=np.int64)
        b = self.bucket_of(k)
        out = np.zeros(k.shape, dtype=bool)
        for bucket in np.unique(b):
            mask = b == bucket
            out[mask] = self.filters[int(bucket)].contains(k[mask])
        return out

    def merge(self, other: "BucketedBloom") -> "BucketedBloom":
        assert self.n_buckets == other.n_buckets
        for mine, theirs in zip(self.filters, other.filters):
            mine.merge(theirs)
        return self

    def bucket_rows(self):
        """Rows for the ``seen_sketch`` table (SURVEY.md §1.2)."""
        for i, f in enumerate(self.filters):
            yield {
                "bucket": i,
                "kind": "bloom",
                "bits": f.to_bytes(),
                "n_bits": f.n_bits,
                "n_hashes": f.n_hashes,
            }

    @classmethod
    def from_bucket_rows(cls, rows) -> "BucketedBloom":
        rows = sorted(rows, key=lambda r: r["bucket"])
        assert rows, "empty sketch table"
        n_bits = int(rows[0]["n_bits"])
        n_hashes = int(rows[0]["n_hashes"])
        out = cls(len(rows), n_bits, n_hashes)
        for r in rows:
            out.filters[int(r["bucket"])] = Bloom.from_bytes(
                bytes(r["bits"]), n_bits, n_hashes
            )
        return out
