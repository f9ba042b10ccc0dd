"""Mixed-config batching: several streams with different bitrates/modes/rates
encoded in ONE device batch must each match their per-stream golden output."""
from pathlib import Path

import numpy as np
import pytest

from odr_audioenc_tpu.mp2.model import Mp2Encoder, make_config
from odr_audioenc_tpu.host.mp2pack import Mp2Packer

import gen_golden

GOLDEN = Path(__file__).parent / "golden"

BATCH = [
    "music_48s_128_j_psy1",
    "music_48s_192_s_psy1",
    "music_48m_96_m_psy1",
    "music_48s_64_j_psy1",
    "music_24m_64_m_psy1",
    "music_48s_128_d_psy1",
]


def test_mixed_batch():
    n_frames = 30
    inputs, cfgs = [], []
    for name in BATCH:
        signame, nf, rate, bitrate, mode, psy, xpad_len = gen_golden.CONFIGS[name]
        frames, _ = gen_golden.make_input(name)
        assert len(frames) >= n_frames
        inputs.append(frames[:n_frames])
        cfgs.append({"rate": rate, "bitrate": bitrate, "mode": mode})
    pcm = np.stack(inputs, axis=1)  # [nf, S, 2, 1152]

    cfg = make_config(cfgs)
    enc = Mp2Encoder(cfg, psy_model=1)
    packer = Mp2Packer(cfg)
    state = enc.init_state()
    streams = [b""] * len(BATCH)
    for fi in range(n_frames):
        state, out = enc.encode_step(state, pcm[fi])
        out_np = {k: np.asarray(v) for k, v in out.items()}
        for i, chunk in enumerate(packer.emit(out_np)):
            streams[i] += chunk
    for i, chunk in enumerate(packer.finish()):
        streams[i] += chunk

    for i, name in enumerate(BATCH):
        # drop the final frame: its ScF-CRC is unpatched here but patched by
        # the later frames present in the longer golden run
        n = len(streams[i]) - int(cfg.lg_frame[i])
        want = (GOLDEN / f"{name}.mp2").read_bytes()[:n]
        assert streams[i][:n] == want, f"stream {name} diverged in mixed batch"


@pytest.mark.parametrize("psy", [2, 3])
def test_f32_path_psy23_produces_valid_frames(psy):
    """The f32 throughput path for psy models 2/3 emits parseable frames
    whose allocations mostly agree with the exact f64 path."""
    import jax.numpy as jnp
    from odr_audioenc_tpu.host import mp2parse
    import signals

    frames_in = signals.frames_of(signals.music_like(6))[:6]
    cfg = make_config([{"rate": 48000, "bitrate": 128, "mode": "j"}])
    outs = {}
    for dtype in (jnp.float64, jnp.float32):
        enc = Mp2Encoder(cfg, psy_model=psy, dtype=dtype)
        pk = Mp2Packer(cfg)
        state = enc.init_state()
        chunks, allocs = [], []
        for f in frames_in:
            state, out = enc.encode_step(state, f[None])
            out_np = {k: np.asarray(v) for k, v in out.items()}
            allocs.append(out_np["bit_alloc"])
            chunks += pk.emit(out_np)
        chunks += pk.finish()
        outs[str(dtype)] = (b"".join(chunks), np.stack(allocs))
    (b64, a64), (b32, a32) = outs.values()
    for fr in mp2parse.split_frames(b32):
        mp2parse.parse_frame(fr)  # validates header/CRC structure
    agree = (a64 == a32).mean()
    assert agree > 0.95, f"psy{psy} f32 allocation agreement {agree:.3f}"
