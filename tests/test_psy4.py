"""Psy models 4 and n1: psycho_4 validated against the reference symbol
directly (the public toolame API clamps models to 0..3, so these paths are
validated below the API surface)."""
import ctypes

import jax.numpy as jnp
import numpy as np

import toolame_ref


class _Options(ctypes.Structure):
    # options.h:8-23
    _fields_ = [("usepsy", ctypes.c_int), ("usepadbit", ctypes.c_int),
                ("quickmode", ctypes.c_int), ("quickcount", ctypes.c_int),
                ("byteswap", ctypes.c_int), ("dab", ctypes.c_int),
                ("vbr", ctypes.c_int), ("vbrlevel", ctypes.c_float),
                ("athlevel", ctypes.c_float), ("verbosity", ctypes.c_int),
                ("show_level", ctypes.c_int)]


def test_psycho4_matches_reference_symbol():
    from odr_audioenc_tpu.mp2 import psycho4
    toolame_ref.ensure_built()
    lib = ctypes.CDLL(str(toolame_ref.SO))
    glopts = _Options()
    glopts.athlevel = 0.0
    glopts.verbosity = 0
    psy4 = lib.psycho_4
    psy4.restype = None

    savebuf = np.zeros(1056, np.int16)
    rng = np.random.default_rng(42)
    frames = rng.integers(-12000, 12000, (5, 1152)).astype(np.int16)

    tabs = psycho4.make_psy4_tables(48000.0)
    state = psycho4.init_psy4_state(1, jnp.float64)
    for i in range(5):
        smr_ref = np.zeros(32, np.float64)
        buf = np.ascontiguousarray(frames[i])
        psy4(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
             savebuf.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
             ctypes.c_int(0),
             smr_ref.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
             ctypes.c_double(48000.0), ctypes.byref(glopts))
        smr_ours, state = psycho4.psycho_4(
            jnp.asarray(frames[i:i + 1], jnp.float64), state, tabs,
            jnp.float64)
        d = float(np.abs(np.asarray(smr_ours)[0] - smr_ref).max())
        assert d < 1e-9, f"frame {i}: psycho_4 SMR diff {d}"


def test_psycho_n1_and_model4_encode():
    """Both extra models run end-to-end through the encoder + packer."""
    from odr_audioenc_tpu.mp2.model import Mp2Encoder, make_config
    from odr_audioenc_tpu.host.mp2pack import Mp2Packer

    rng = np.random.default_rng(0)
    for model in (-1, 4):
        cfg = make_config([{"rate": 48000, "bitrate": 128, "mode": "j"}])
        enc = Mp2Encoder(cfg, psy_model=model, dtype=jnp.float64)
        pk = Mp2Packer(cfg)
        state = enc.init_state()
        chunks = []
        for _ in range(3):
            pcm = rng.integers(-9000, 9000, (1, 2, 1152)).astype(np.int16)
            state, out = enc.encode_step(state, pcm)
            chunks += pk.emit({k: np.asarray(v) for k, v in out.items()})
        chunks += pk.finish()
        data = b"".join(c for c in chunks if c)
        assert len(data) == 3 * 384, (model, len(data))
        assert data[0] == 0xFF and (data[1] & 0xF0) == 0xF0  # frame sync
