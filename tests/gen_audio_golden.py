"""Regenerate tests/fixtures/audio_golden.json from stdlib ``audioop``.

``audioop`` is the independent C oracle for the G.711 / IMA-ADPCM decoders
(an independent transcription of the same public specs), but it was
deprecated in Python 3.11 and REMOVED in 3.13 — so the oracle's outputs are
frozen here as fixtures while an interpreter that still ships it exists.
The test suite consumes the fixture; ``test_audio_golden_matches_audioop``
re-derives it live whenever audioop is importable (importorskip otherwise).

Run: python tests/gen_audio_golden.py
"""

from __future__ import annotations

import json
import os

import numpy as np


def golden() -> dict:
    import audioop

    codes = bytes(range(256))
    ulaw = np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2")
    alaw = np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2")

    # inner-loop vector: nibble stream from rng(13), decoded from state
    # (pred=-1234, idx=30). audioop packs HIGH nibble first.
    rng = np.random.default_rng(13)
    nibbles = [int(x) for x in rng.integers(0, 16, size=64)]
    packed_inner = bytes(
        (nibbles[i] << 4) | nibbles[i + 1] for i in range(0, 64, 2)
    )
    inner_ref = np.frombuffer(
        audioop.adpcm2lin(packed_inner, 2, (-1234, 30))[0], dtype="<i2"
    )

    # multiblock vector: audioop's own ENCODER from zero state over a
    # deterministic sine, plus its decode of that stream.
    sig = (np.sin(np.arange(128) / 5.0) * 18000).astype("<i2")
    packed_multi, _ = audioop.lin2adpcm(sig.tobytes(), 2, None)
    multi_ref = np.frombuffer(
        audioop.adpcm2lin(packed_multi, 2, (0, 0))[0], dtype="<i2"
    )

    return {
        "ulaw_lut": [int(x) for x in ulaw],
        "alaw_lut": [int(x) for x in alaw],
        "adpcm_inner": {
            "pred": -1234,
            "idx": 30,
            "nibbles": nibbles,
            "ref": [int(x) for x in inner_ref],
        },
        "adpcm_multiblock": {
            "packed_hex": packed_multi.hex(),
            "ref": [int(x) for x in multi_ref],
        },
    }


if __name__ == "__main__":
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fixtures",
        "audio_golden.json",
    )
    with open(path, "w") as f:
        json.dump(golden(), f)
    print("wrote", path)
