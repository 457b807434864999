"""Bloom sketch property tests (SURVEY.md §5.4): zero false negatives,
associative/commutative merge (treeAggregate order-safety), bounded fpp,
round-trip serialization."""

import numpy as np
import pytest

from spiderspark.sketch import Bloom, BucketedBloom, optimal_params

RNG = np.random.default_rng(42)


def _keys(n, lo=-(2**62), hi=2**62):
    return RNG.integers(lo, hi, size=n, dtype=np.int64)


def test_no_false_negatives():
    keys = _keys(50_000)
    b = Bloom.for_capacity(50_000, fpp=0.01).add(keys)
    assert b.contains(keys).all()


def test_fpp_bounded():
    keys = _keys(20_000)
    b = Bloom.for_capacity(20_000, fpp=0.01).add(keys)
    probe = _keys(100_000)
    probe = probe[~np.isin(probe, keys)]
    fpp = b.contains(probe).mean()
    assert fpp < 0.03, f"observed fpp {fpp}"


def test_merge_assoc_comm():
    a_keys, b_keys, c_keys = _keys(1000), _keys(1000), _keys(1000)
    n_bits, n_hashes = optimal_params(3000, 0.01)

    def fresh(keys):
        return Bloom(n_bits, n_hashes).add(keys)

    left = fresh(a_keys).merge(fresh(b_keys)).merge(fresh(c_keys))
    right = fresh(c_keys).merge(fresh(a_keys).merge(fresh(b_keys)))
    assert (left.words == right.words).all()


def test_serialization_roundtrip():
    keys = _keys(5000)
    b = Bloom.for_capacity(5000).add(keys)
    b2 = Bloom.from_bytes(b.to_bytes(), b.n_bits, b.n_hashes)
    assert (b2.words == b.words).all()
    assert b2.contains(keys).all()


def test_bucketed_routing_and_membership():
    keys = _keys(30_000)
    bb = BucketedBloom.for_capacity(30_000, n_buckets=8, fpp=0.01).add(keys)
    assert bb.contains(keys).all()
    # buckets are disjoint responsibilities: a key's membership only
    # consults its own bucket
    b = bb.bucket_of(keys)
    assert (b >= 0).all() and (b < 8).all()


def test_bucket_rows_roundtrip():
    keys = _keys(10_000)
    bb = BucketedBloom.for_capacity(10_000, n_buckets=4).add(keys)
    bb2 = BucketedBloom.from_bucket_rows(list(bb.bucket_rows()))
    assert bb2.contains(keys).all()
    for f1, f2 in zip(bb.filters, bb2.filters):
        assert (f1.words == f2.words).all()


def test_empty_bloom_contains_nothing_much():
    b = Bloom.for_capacity(1000)
    assert not b.contains(_keys(1000)).any()


# -- cuckoo tier (BASELINE names "Bloom/cuckoo"; bloom is the in-loop default
# because a cuckoo insert can fail under load — see sketch.CuckooFilter) -----


def test_cuckoo_no_false_negatives_under_load():
    from spiderspark.sketch import CuckooFilter

    rng = np.random.RandomState(5)
    keys = np.unique(rng.randint(-(2**62), 2**62, size=40_000))
    cf = CuckooFilter.for_capacity(len(keys)).add(keys)
    assert cf.contains(keys).all()
    assert 0.3 < cf.load_factor < 0.96


def test_cuckoo_fpp_reasonable():
    from spiderspark.sketch import CuckooFilter

    rng = np.random.RandomState(6)
    keys = rng.randint(-(2**62), 2**62, size=20_000)
    cf = CuckooFilter.for_capacity(30_000).add(keys)
    fresh = rng.randint(-(2**62), 2**62, size=50_000)
    fpp = cf.contains(fresh).mean()
    assert fpp < 0.02  # 16-bit fingerprints, 2 buckets × 4 slots ⇒ ~8/2^16


def test_cuckoo_delete_restores_absence():
    from spiderspark.sketch import CuckooFilter

    rng = np.random.RandomState(7)
    keys = np.unique(rng.randint(-(2**62), 2**62, size=5_000))
    cf = CuckooFilter.for_capacity(10_000).add(keys)
    victims = keys[:1000]
    assert cf.delete(victims).all()
    # deleted keys may still collide with survivors' fingerprints (fp rate),
    # but the overwhelming majority must now be absent
    assert cf.contains(victims).mean() < 0.05
    assert cf.contains(keys[1000:]).all()  # survivors untouched


def test_cuckoo_overflow_raises_not_drops():
    from spiderspark.sketch import CuckooFilter

    rng = np.random.RandomState(8)
    cf = CuckooFilter(8)  # 32 slots total
    keys = np.unique(rng.randint(-(2**62), 2**62, size=500))
    with pytest.raises(OverflowError):
        cf.add(keys)


def test_cuckoo_bytes_roundtrip():
    from spiderspark.sketch import CuckooFilter

    rng = np.random.RandomState(9)
    keys = rng.randint(-(2**62), 2**62, size=3_000)
    cf = CuckooFilter.for_capacity(5_000).add(keys)
    cf2 = CuckooFilter.from_bytes(cf.to_bytes(), cf.n_buckets)
    assert (cf2.slots == cf.slots).all()
    assert cf2.contains(keys).all()


def test_cuckoo_overflow_rolls_back_displacement_chain():
    """ADVICE r02: a failed insert must not corrupt membership of keys that
    were already added — the eviction walk is undone before raising."""
    from spiderspark.sketch import CuckooFilter

    rng = np.random.RandomState(10)
    cf = CuckooFilter(8)  # 32 slots total — overflows quickly
    keys = np.unique(rng.randint(-(2**62), 2**62, size=500))
    added = []
    snapshot = None
    for key in keys:
        before = cf.slots.copy()
        try:
            cf.add([key])
            added.append(key)
        except OverflowError:
            snapshot = before
            break
    assert snapshot is not None, "filter never overflowed — enlarge the key set"
    # state is EXACTLY what it was before the failing insert...
    assert (cf.slots == snapshot).all()
    # ...so every previously-added key is still present (zero false negatives)
    assert cf.contains(np.array(added)).all()
