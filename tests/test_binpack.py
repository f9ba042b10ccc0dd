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


def _run(streams, n_frames=4, seed=0, quiet=False, xpad_len=0):
    cfg = make_config(streams)
    rng = np.random.default_rng(seed)
    S = cfg.n_streams
    enc_a = Mp2Encoder(cfg, psy_model=1, dtype=jnp.float32)
    enc_b = Mp2Encoder(cfg, psy_model=1, dtype=jnp.float32,
                       pack_on_device=True)
    st_a, st_b = enc_a.init_state(), enc_b.init_state()
    outs = []
    for k in range(n_frames):
        if quiet:
            # near-silence and exact silence: forces bit_alloc=0 bands,
            # tiny payloads and sparse slot groups (the splice's partial-
            # byte and zero-allocation boundary conditions)
            pcm = rng.integers(-2, 3, (S, 2, 1152))
            if k % 2:
                pcm[:] = 0
            pcm = jnp.asarray(pcm, jnp.int16)
        else:
            pcm = jnp.asarray(rng.integers(-28000, 28000, (S, 2, 1152)),
                              jnp.int16)
        xpad = jnp.full((S,), xpad_len, jnp.int32)
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


def test_silence_and_near_silence_payloads():
    """ADVICE round 2: sparse/zero allocations (silent input) must stay
    byte-equal between the codeword path and the device payload path."""
    streams = CONFIGS * 2
    cfg, outs = _run(streams, seed=2, quiet=True)
    pk_a, pk_b = Mp2Packer(cfg), Mp2Packer(cfg)
    for out_a, out_b in outs:
        fr_a = pk_a.emit(out_a, use_native=False)
        fr_b = pk_b.emit(out_b, use_native=False)
        for i, (a, b) in enumerate(zip(fr_a, fr_b)):
            assert bytes(a) == bytes(b), f"stream {i} silent frame differs"


def test_xpad_after_splice():
    """X-PAD bytes riding behind the spliced payload must come out
    identically through the python and native packers."""
    from odr_audioenc_tpu.host import native
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    streams = [dict(s, pad_len=16) for s in CONFIGS]
    cfg, outs = _run(streams, seed=3, xpad_len=8)
    pk_a, pk_b = Mp2Packer(cfg), Mp2Packer(cfg)
    rng = np.random.default_rng(9)
    for _, out_b in outs:
        xp = []
        for i in range(cfg.n_streams):
            dl = int(cfg.dab_length[i])
            buf = bytes(rng.integers(0, 256, dl, dtype=np.uint8))
            xp.append((buf, 8))  # 8 used X-PAD bytes + F-PAD tail
        fr_py = pk_a.emit(out_b, xp, use_native=False)
        fr_nat = pk_b.emit(out_b, xp, use_native=True)
        for i, (a, b) in enumerate(zip(fr_py, fr_nat)):
            assert bytes(a) == bytes(b), f"stream {i} xpad frame differs"
