"""Device full-frame MP2 emission (mp2/framepack.py) vs the host packer:
byte-equality across modes, rates, PAD, and the ScF-CRC one-frame delay."""
import numpy as np
import jax.numpy as jnp
import pytest

from odr_audioenc_tpu.mp2.model import Mp2Encoder, make_config
from odr_audioenc_tpu.host.mp2pack import Mp2Packer

STREAMS = [
    {"rate": 48000, "bitrate": 128, "mode": "j"},
    {"rate": 48000, "bitrate": 192, "mode": "s"},
    {"rate": 48000, "bitrate": 64, "mode": "m"},
    {"rate": 24000, "bitrate": 64, "mode": "j"},   # MPEG-2 LSF
    {"rate": 48000, "bitrate": 96, "mode": "d"},
    {"rate": 32000, "bitrate": 128, "mode": "j"},  # fractional padding
]


def _pcm(rng, S, kind):
    if kind == "noise":
        return rng.integers(-16000, 16000, (S, 2, 1152)).astype(np.int16)
    if kind == "quiet":
        return rng.integers(-40, 40, (S, 2, 1152)).astype(np.int16)
    t = np.arange(1152) / 48000.0
    x = (12000 * np.sin(2 * np.pi * 1000 * t)).astype(np.int16)
    return np.tile(x, (S, 2, 1)).astype(np.int16)


def _run(pack_mode, n_frames=3, with_pad=False, use_native=False):
    streams = list(STREAMS)
    if with_pad:
        streams = [dict(s, pad_len=16) for s in streams]
    cfg = make_config(streams)
    S = cfg.n_streams
    enc = Mp2Encoder(cfg, psy_model=1, dtype=jnp.float64,
                     pack_on_device=pack_mode)
    packer = Mp2Packer(cfg)
    rng = np.random.default_rng(11)
    emitted = [b""] * S
    for f, kind in zip(range(n_frames), ["noise", "quiet", "tone"]):
        pcm = _pcm(rng, S, kind)
        xpads = None
        xpad_len = None
        xpad_buf = None
        if with_pad:
            bufs = [rng.integers(0, 256, 16).astype(np.uint8) for _ in range(S)]
            used = [int(rng.integers(3, 17)) for _ in range(S)]
            xpads = [(bytes(b), u) for b, u in zip(bufs, used)]
            xpad_len = np.asarray(used, np.int32)
            xpad_buf = np.stack(bufs).astype(np.int32)
        if pack_mode == "frame":
            st = getattr(_run, "_st", None)
            st, out = enc.encode_step(enc.init_state() if f == 0 else st,
                                      pcm, xpad_len, xpad_buf)
            _run._st = st
        else:
            st = getattr(_run, "_st", None)
            st, out = enc.encode_step(enc.init_state() if f == 0 else st,
                                      pcm, xpad_len)
            _run._st = st
        out_np = {k: np.asarray(v) for k, v in out.items()}
        for i, b in enumerate(packer.emit(out_np, xpads=xpads,
                                          use_native=use_native)):
            emitted[i] += b
    for i, b in enumerate(packer.finish()):
        emitted[i] += b
    return emitted


@pytest.mark.parametrize("with_pad", [False, True])
def test_device_frames_match_host(with_pad):
    host = _run(False, with_pad=with_pad)
    dev = _run("frame", with_pad=with_pad)
    for i, (h, d) in enumerate(zip(host, dev)):
        assert h == d, (
            f"stream {i} ({STREAMS[i]}): first diff at "
            f"{next(j for j in range(min(len(h), len(d))) if h[j] != d[j]) if h[:len(d)] != d[:len(h)] else 'len'}"
            f" host={len(h)}B dev={len(d)}B")


def test_device_frames_match_native_splice():
    """Device frames vs the C++ batch packer, including near-silent frames
    (zero-allocation bands, tiny payloads) and X-PAD after the splice - the
    partial-byte splice branch of native/mp2pack.cpp (advisor round-2)."""
    host = _run(False, with_pad=True, use_native=True)
    dev = _run("frame", with_pad=True)
    for i, (h, d) in enumerate(zip(host, dev)):
        assert h == d, f"stream {i} ({STREAMS[i]})"
