"""Stage-level golden test: batched polyphase filterbank vs reference
WindowFilterSubband (bit-exact in f64 up to reduction-order ULPs; we assert
exact equality and fall back to a tight tolerance report if it ever differs)."""
import ctypes

import numpy as np
import jax.numpy as jnp
import pytest

from odr_audioenc_tpu.mp2.polyphase import polyphase_frame

from signals import music_like, frames_of
import toolame_ref


def ref_polyphase(frames):
    """Run the reference WindowFilterSubband over [nf, 2, 1152] int16."""
    toolame_ref.ensure_built()
    lib = ctypes.CDLL(str(toolame_ref.SO))  # fresh state per CDLL? no: per process
    out = np.zeros((len(frames), 2, 3, 12, 32))
    buf = ctypes.create_string_buffer(64)
    for fi, fr in enumerate(frames):
        fr = np.ascontiguousarray(fr, dtype=np.int16)
        for gr in range(3):
            for bl in range(12):
                for ch in range(2):
                    block = np.ascontiguousarray(fr[ch, gr * 384 + 32 * bl : gr * 384 + 32 * bl + 32])
                    s = np.zeros(32)
                    lib.WindowFilterSubband(
                        block.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
                        ctypes.c_int(ch),
                        s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
                    out[fi, ch, gr, bl] = s
    del buf
    return out


def test_polyphase_bit_exact():
    nf = 6
    frames = frames_of(music_like(nf))
    ref = ref_polyphase(frames)

    hist = jnp.zeros((2, 480), dtype=jnp.float64)
    got = np.zeros_like(ref)
    for fi in range(nf):
        x = jnp.asarray(frames[fi], dtype=jnp.float64) / 32768.0
        s, hist = polyphase_frame(hist, x)
        got[fi] = np.asarray(s).reshape(2, 3, 12, 32)

    if not np.array_equal(got, ref):
        diff = np.abs(got - ref)
        rel = diff.max() / np.abs(ref).max()
        # reduction-order ULP differences are acceptable; anything bigger is a bug
        assert rel < 1e-13, f"polyphase mismatch: max abs {diff.max()}, rel {rel}"
        pytest.xfail(f"not bitwise equal (max rel {rel:.2e}) but within f64 reduction tolerance")
