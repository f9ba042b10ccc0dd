"""Native (C++) MP2 packer vs the pure-Python reference implementation."""
import numpy as np
import pytest

from odr_audioenc_tpu.mp2.model import Mp2Encoder, make_config
from odr_audioenc_tpu.host.mp2pack import Mp2Packer
from odr_audioenc_tpu.host import native

import signals


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_native_pack_matches_python():
    rng = np.random.default_rng(7)
    confs = [{"rate": 48000, "bitrate": 128, "mode": "j", "pad_len": 16},
             {"rate": 48000, "bitrate": 192, "mode": "s"},
             {"rate": 24000, "bitrate": 64, "mode": "m"},
             {"rate": 48000, "bitrate": 64, "mode": "j"},
             {"rate": 44100, "bitrate": 128, "mode": "j"}]
    cfg = make_config(confs)
    enc = Mp2Encoder(cfg, psy_model=1)
    state = enc.init_state()
    frames = signals.frames_of(signals.music_like(4))
    for f in frames[:3]:
        pcm = np.broadcast_to(f, (len(confs), 2, 1152))
        xl = np.array([16, 0, 0, 0, 0], np.int32)
        state, out = enc.encode_step(state, pcm, xl)
        out_np = {k: np.asarray(v) for k, v in out.items()}
        xpads = [(bytes(rng.integers(0, 256, 16, dtype=np.uint8).tolist()), 16),
                 None, None, None, None]
        got = Mp2Packer(cfg)._pack_all_native(out_np, xpads)
        assert got is not None
        for i in range(len(confs)):
            want = Mp2Packer(cfg)._pack_one(i, out_np, xpads[i])
            assert bytes(got[i][0]) == bytes(want[0]), f"stream {i} bytes"
            assert got[i][1] == want[1]
            assert list(got[i][2]) == list(want[2])
