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
