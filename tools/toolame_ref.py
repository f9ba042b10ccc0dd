"""ctypes driver for the reference libtoolame-dab (golden-output generation).

Only used at test-fixture-generation time; the encoder package never imports
this.  API mirrors src/odr-audioenc.cpp:686-735's usage of toolame.h.
"""
import ctypes
import subprocess
from pathlib import Path

import numpy as np

SCRATCH = Path(__file__).resolve().parent.parent / ".scratch"
SO = SCRATCH / "libtoolame-dab.so"


def ensure_built():
    if not SO.exists():
        subprocess.run(["bash", str(Path(__file__).parent / "build_reference.sh")], check=True)


class ToolameRef:
    """One-shot reference MP2 encoder (the .so has global state: one instance
    per process; use fresh subprocesses for multiple configs)."""

    def __init__(self, sample_rate=48000, bitrate=128, mode="j", psy_model=1, pad_len=0):
        ensure_built()
        self.lib = ctypes.CDLL(str(SO))
        lib = self.lib
        assert lib.toolame_init() == 0
        assert lib.toolame_set_samplerate(ctypes.c_long(sample_rate)) == 0
        assert lib.toolame_set_channel_mode(ctypes.c_char(mode.encode())) == 0
        assert lib.toolame_set_psy_model(psy_model) == 0
        if pad_len:
            assert lib.toolame_set_pad(pad_len) == 0
        assert lib.toolame_set_bitrate(bitrate) == 0

    def encode_frame(self, pcm, xpad=b""):
        """pcm: int16 array [2][1152] (channel-major). Returns emitted bytes."""
        pcm = np.ascontiguousarray(pcm, dtype=np.int16)
        assert pcm.shape == (2, 1152)
        out = ctypes.create_string_buffer(32768)
        xbuf = ctypes.create_string_buffer(bytes(xpad), len(xpad)) if xpad else None
        n = self.lib.toolame_encode_frame(
            pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
            xbuf, ctypes.c_size_t(len(xpad)),
            out, ctypes.c_size_t(len(out)))
        return out.raw[:n]

    def finish(self):
        out = ctypes.create_string_buffer(32768)
        n = self.lib.toolame_finish(out, ctypes.c_size_t(len(out)))
        return out.raw[:n]

    def encode(self, pcm_frames, xpads=None):
        """pcm_frames: int16 [nframes, 2, 1152] -> full mp2 byte stream."""
        chunks = []
        for i, f in enumerate(pcm_frames):
            chunks.append(self.encode_frame(f, xpads[i] if xpads else b""))
        chunks.append(self.finish())
        return b"".join(chunks)
