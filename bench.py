#!/usr/bin/env python
"""Bench entry point (driver contract): runs the headline scheduling+dedup
job at $SPARK_GRAFT_SF_DIR / local[$SPARK_GRAFT_CPUS] plus the headline
query set, printing ONE JSON line. `--scaling` additionally evidences the
N→4N criterion at local[8] vs local[32] and writes BENCH/BASELINE.md."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)

from spiderspark.bench import main

if __name__ == "__main__":
    main()
