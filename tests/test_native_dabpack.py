"""Native (C++) DAB+ superframe packer vs the pure-Python implementation."""
import numpy as np
import pytest

from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig
from odr_audioenc_tpu.host import native

import signals


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
@pytest.mark.parametrize("aot,subch,ch,pad", [
    ("lc", 12, 2, 0),
    ("lc", 16, 1, 8),
    ("sbr", 8, 1, 0),
    ("sbr", 10, 2, 0),
    ("ps", 6, 2, 0),
])
def test_native_dabpack_matches_python(aot, subch, ch, pad):
    rng = np.random.default_rng(11)
    cfg = DabPlusConfig(48000, subch, ch, aot=aot, pad_len=pad)
    enc = DabPlusEncoder(cfg, n_streams=2)
    sig = signals.music_like(10, stereo=(ch == 2))[:ch].copy()
    # splice an attack so the batch contains EIGHT_SHORT/START/STOP AUs
    # (exercises the native short-block syntax path)
    sig[:, 2000:2200] = 16000
    n = cfg.num_aus * cfg.au_samples
    pcm = np.stack([sig[:, :n], sig[:, n:2 * n]])
    pads = None
    if pad:
        pads = [[bytes(rng.integers(0, 256, pad, dtype=np.uint8).tolist())
                 for _ in range(cfg.num_aus)] for _ in range(2)]
    state, out = enc.encode_superframes(enc.init_state(), pcm, pack=False,
                                        pads=pads)
    out_np = {k: np.asarray(v) for k, v in out.items()}
    want = enc.pack_superframes(out_np, add_rs=True, pads=pads,
                                use_native=False)
    got = enc.pack_superframes(out_np, add_rs=True, pads=pads)
    for s in range(2):
        assert got[s] == want[s], f"stream {s} superframe mismatch ({aot})"
