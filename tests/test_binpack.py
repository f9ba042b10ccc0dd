"""Device-side sample-section packing (mp2/binpack.py) equivalence.

The payload path must produce byte-identical MP2 frames to the host
serialization of the raw codewords, through BOTH the Python packer splice
and the native splice (mp2pack.cpp), across mono/stereo/joint configs and
the 44.1 kHz padding family.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from odr_audioenc_tpu.mp2.model import Mp2Encoder, make_config
from odr_audioenc_tpu.host.mp2pack import Mp2Packer

CONFIGS = [
    {"rate": 48000, "bitrate": 128, "mode": "j"},
    {"rate": 48000, "bitrate": 192, "mode": "s"},
    {"rate": 48000, "bitrate": 64, "mode": "m"},
    {"rate": 44100, "bitrate": 128, "mode": "j"},
    {"rate": 24000, "bitrate": 64, "mode": "j"},
]


def _run(streams, n_frames=4, seed=0):
    cfg = make_config(streams)
    rng = np.random.default_rng(seed)
    S = cfg.n_streams
    enc_a = Mp2Encoder(cfg, psy_model=1, dtype=jnp.float32)
    enc_b = Mp2Encoder(cfg, psy_model=1, dtype=jnp.float32,
                       pack_on_device=True)
    st_a, st_b = enc_a.init_state(), enc_b.init_state()
    outs = []
    for _ in range(n_frames):
        pcm = jnp.asarray(rng.integers(-28000, 28000, (S, 2, 1152)),
                          jnp.int16)
        xpad = jnp.zeros((S,), jnp.int32)
        st_a, out_a = enc_a.encode_step(st_a, pcm, xpad)
        st_b, out_b = enc_b.encode_step(st_b, pcm, xpad)
        outs.append(({k: np.asarray(v) for k, v in out_a.items()},
                     {k: np.asarray(v) for k, v in out_b.items()}))
    return cfg, outs


def test_payload_matches_codeword_path():
    streams = CONFIGS * 2
    cfg, outs = _run(streams)
    pk_a, pk_b = Mp2Packer(cfg), Mp2Packer(cfg)
    for out_a, out_b in outs:
        fr_a = pk_a.emit(out_a, use_native=False)
        fr_b = pk_b.emit(out_b, use_native=False)
        for i, (a, b) in enumerate(zip(fr_a, fr_b)):
            assert bytes(a) == bytes(b), f"stream {i} frame differs"


def test_native_splice_matches_python():
    from odr_audioenc_tpu.host import native
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    streams = CONFIGS * 2
    cfg, outs = _run(streams, seed=1)
    pk_a, pk_b = Mp2Packer(cfg), Mp2Packer(cfg)
    for _, out_b in outs:
        fr_py = pk_a.emit(out_b, use_native=False)
        fr_nat = pk_b.emit(out_b, use_native=True)
        for i, (a, b) in enumerate(zip(fr_py, fr_nat)):
            assert bytes(a) == bytes(b), f"stream {i} native splice differs"
