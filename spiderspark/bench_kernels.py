"""Kernel-scaling evidence (BENCH/BASELINE.md supporting experiment).

Measures the pure Arrow-side kernels (canonicalize+host, HTML→text
extraction, bloom add/contains) in N pinned OS processes — no Spark. This
isolates the CPU-parallel fraction of a crawl round from Spark's shared
single-box shuffle/IO machinery: on a real 4N-node cluster, shuffle
bandwidth scales with nodes; in this sandbox it cannot, so per-kernel
process scaling is the honest upper-bound evidence for the N→4N criterion.

Run: python -m spiderspark.bench_kernels
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def _canon_work(args):
    lo, hi = args
    import numpy as np

    from .canon import canonicalize_series, host_of_series
    from .pages import url_for_ids

    ids = np.arange(lo, hi)
    norm = canonicalize_series(url_for_ids(ids))
    host_of_series(norm)
    return hi - lo


def _extract_work(args):
    lo, hi = args
    import numpy as np

    from .canon import extract_text_series
    from .pages import gen_pages_pdf

    pdf = gen_pages_pdf(np.arange(lo, hi), hi)
    extract_text_series(pdf["html"])
    return hi - lo


def _bloom_work(args):
    lo, hi = args
    import numpy as np

    from .sketch import Bloom

    keys = np.random.default_rng(lo).integers(-(2**62), 2**62, hi - lo, dtype=np.int64)
    b = Bloom.for_capacity(hi - lo, 0.01).add(keys)
    b.contains(keys)
    return hi - lo


KERNELS = {
    "canonicalize": (_canon_work, 3_200_000),
    "extract_text": (_extract_work, 320_000),
    "bloom": (_bloom_work, 6_400_000),
}


def run(procs_levels=(8, 32)) -> dict:
    out = {}
    for name, (fn, n) in KERNELS.items():
        rates = {}
        for procs in procs_levels:
            chunks = [(i * n // procs, (i + 1) * n // procs) for i in range(procs)]
            with mp.Pool(procs) as pool:
                pool.map(fn, [(0, 200)] * procs)  # warm imports per worker
                t0 = time.time()
                pool.map(fn, chunks)
                dt = time.time() - t0
            rates[procs] = round(n / dt, 0)
        lo, hi = procs_levels
        out[name] = {
            "rate_per_sec": rates,
            "efficiency": round((rates[hi] / rates[lo]) / (hi / lo), 3),
        }
    return out


if __name__ == "__main__":
    print(json.dumps(run()))
