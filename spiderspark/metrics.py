"""Runtime metrics helpers: shuffle-volume accounting for the scaling
evidence (BASELINE.json:2). The per-round shuffle bytes are the quantity the
keyed state layout is designed to bound — O(delta), not O(state) — so the
bench records them alongside wall time.

Reads Spark's status store via the REST status API (requires
``spark.ui.enabled=true`` — the bench sessions set it); returns None when
the UI is disabled."""

from __future__ import annotations

import json
import urllib.request


def shuffle_totals(spark) -> dict | None:
    """Cumulative shuffle read/write bytes across all completed stages of
    this application. Subtract two snapshots to get a window's volume."""
    sc = spark.sparkContext
    base = sc.uiWebUrl
    if not base:
        return None
    try:
        url = f"{base}/api/v1/applications/{sc.applicationId}/stages"
        with urllib.request.urlopen(url, timeout=10) as resp:
            stages = json.load(resp)
        return {
            "shuffle_write_bytes": sum(
                s.get("shuffleWriteBytes", 0) for s in stages
            ),
            "shuffle_read_bytes": sum(
                s.get("shuffleReadBytes", 0) for s in stages
            ),
            "n_stages": len(stages),
        }
    except Exception:
        return None


class ShuffleWindow:
    """Context helper: bytes shuffled between start() and stop()."""

    def __init__(self, spark):
        self.spark = spark
        self.start_snapshot = None

    def start(self) -> "ShuffleWindow":
        self.start_snapshot = shuffle_totals(self.spark)
        return self

    def stop(self) -> dict | None:
        end = shuffle_totals(self.spark)
        if end is None or self.start_snapshot is None:
            return None
        return {
            "shuffle_write_bytes": end["shuffle_write_bytes"]
            - self.start_snapshot["shuffle_write_bytes"],
            "shuffle_read_bytes": end["shuffle_read_bytes"]
            - self.start_snapshot["shuffle_read_bytes"],
        }
