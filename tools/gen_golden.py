#!/usr/bin/env python3
"""Generate golden MP2 streams with the reference encoder for the test suite.

Each config runs in a fresh subprocess because libtoolame-dab has global state.

Usage:  python tools/gen_golden.py          # generate all -> tests/golden/
        python tools/gen_golden.py NAME     # (internal) generate one config
"""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from signals import SIGNALS, frames_of, silence  # noqa: E402

GOLDEN = Path(__file__).resolve().parent.parent / "tests" / "golden"

# name: (signal, n_frames, rate, bitrate, mode, psy, xpad_len)
CONFIGS = {
    "music_48s_128_j_psy1": ("music", 40, 48000, 128, "j", 1, 0),
    "speech_48s_128_j_psy1": ("speech", 40, 48000, 128, "j", 1, 0),
    "tones_48s_128_j_psy1": ("tones", 30, 48000, 128, "j", 1, 0),
    "silence_48s_128_j_psy1": ("silence", 10, 48000, 128, "j", 1, 0),
    "music_48s_192_s_psy1": ("music", 30, 48000, 192, "s", 1, 0),
    "music_48m_96_m_psy1": ("music", 30, 48000, 96, "m", 1, 0),
    "music_48s_64_j_psy1": ("music", 30, 48000, 64, "j", 1, 0),
    "music_48s_256_s_psy1": ("music", 30, 48000, 256, "s", 1, 0),
    "music_24m_64_m_psy1": ("music", 30, 24000, 64, "m", 1, 0),
    "music_24s_160_j_psy1": ("music", 30, 24000, 160, "j", 1, 0),
    "music_48s_128_d_psy1": ("music", 30, 48000, 128, "d", 1, 0),
    "music_48s_128_j_psy0": ("music", 30, 48000, 128, "j", 0, 0),
    "music_48s_128_j_psy3": ("music", 30, 48000, 128, "j", 3, 0),
    "tones_48s_192_s_psy3": ("tones", 20, 48000, 192, "s", 3, 0),
    "music_48s_128_j_psy1_xpad16": ("music", 30, 48000, 128, "j", 1, 16),
    "music_44s_128_j_psy1": ("music", 30, 44100, 128, "j", 1, 0),
    "music_44s_160_s_psy1": ("music", 30, 44100, 160, "s", 1, 0),
    "music_48s_128_j_psy2": ("music", 30, 48000, 128, "j", 2, 0),
    "tones_48s_192_s_psy2": ("tones", 20, 48000, 192, "s", 2, 0),
}


def make_input(name):
    signame, nf, rate, bitrate, mode, psy, xpad_len = CONFIGS[name]
    stereo = mode != "m"
    if signame == "silence":
        sig = silence(nf, stereo)
    else:
        sig = SIGNALS[signame](nf, stereo=stereo, rate=rate)
    frames = frames_of(sig)
    xpads = None
    if xpad_len:
        rng = np.random.default_rng(4242)
        xpads = [rng.integers(0, 256, xpad_len, dtype=np.uint8).tobytes() for _ in range(nf)]
    return frames, xpads


def gen_one(name):
    from toolame_ref import ToolameRef

    signame, nf, rate, bitrate, mode, psy, xpad_len = CONFIGS[name]
    frames, xpads = make_input(name)
    enc = ToolameRef(sample_rate=rate, bitrate=bitrate, mode=mode, psy_model=psy,
                     pad_len=xpad_len)
    stream = enc.encode(frames, xpads)
    GOLDEN.mkdir(parents=True, exist_ok=True)
    (GOLDEN / f"{name}.mp2").write_bytes(stream)
    print(f"{name}: {len(stream)} bytes")


def main():
    if len(sys.argv) > 1:
        gen_one(sys.argv[1])
        return
    for name in CONFIGS:
        subprocess.run([sys.executable, __file__, name], check=True)
    (GOLDEN / "configs.json").write_text(json.dumps(CONFIGS, indent=1))


if __name__ == "__main__":
    main()
