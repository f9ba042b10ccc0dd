"""JACK input (io/jack_in.py): ctypes client driven by a fake libjack
(tools/fake_jack.c) that feeds deterministic sines and then shuts down -
covers port registration, float->S16 conversion, interleave, the
SampleQueue push path and fault detection (reference: src/JackInput.cpp)."""
import os
import subprocess
import time
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent


def _build_fake_jack():
    out = ROOT / ".scratch" / "libfakejack.so"
    src = ROOT / "tools" / "fake_jack.c"
    if not out.exists() or src.stat().st_mtime > out.stat().st_mtime:
        out.parent.mkdir(exist_ok=True)
        subprocess.check_call(["g++", "-shared", "-fPIC", "-O2",
                               "-o", str(out), str(src), "-lpthread"])
    return out


def test_jack_input_capture(monkeypatch):
    lib = _build_fake_jack()
    monkeypatch.setenv("ODR_JACK_LIB", str(lib))
    from odr_audioenc_tpu.io.jack_in import JackInput
    from odr_audioenc_tpu.io.queue import SampleQueue

    q = SampleQueue()
    q.configure(1 << 20, push_block=False, channels=2)
    inp = JackInput(q, "test", 48000, 2)
    inp.prepare()
    deadline = time.time() + 5.0
    while not inp.fault_detected() and time.time() < deadline:
        time.sleep(0.02)
    assert inp.fault_detected(), "fake server shutdown not detected"
    inp.close()

    n = 20 * 256  # NCALLS * NFRAMES
    buf, _, _ = q.pop(n * 2 * 2)
    pcm = np.frombuffer(buf, np.int16).reshape(-1, 2)
    assert pcm.shape[0] == n
    t = np.arange(n)
    for c, amp in ((0, 0.25), (1, 0.5)):
        want = np.clip(np.rint(
            amp * np.sin(2 * np.pi * 997.0 * t / 48000.0) * 32768.0),
            -32768, 32767)
        # float32 sine in C vs float64 here: allow 1-LSB rounding skew
        assert np.abs(pcm[:, c] - want).max() <= 1


def test_jack_gate_without_library(monkeypatch):
    monkeypatch.setenv("ODR_JACK_LIB", "/nonexistent/libjack.so.0")
    from odr_audioenc_tpu.io.jack_in import JackInput
    from odr_audioenc_tpu.io.queue import SampleQueue
    q = SampleQueue()
    q.configure(1 << 16, push_block=False, channels=2)
    inp = JackInput(q, "x", 48000, 2)
    with pytest.raises(RuntimeError, match="libjack"):
        inp.prepare()
