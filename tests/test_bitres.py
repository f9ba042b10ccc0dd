"""Cross-superframe bit reservoir (FDKaacEnc_updateBitres analogue,
aacenc.cpp:961-1000): the leftover budget is carried in the state pytree,
capped, and can never overrun the hard superframe byte budget
(tpenc_dab.cpp:403)."""
import numpy as np

from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig
from odr_audioenc_tpu.fec.rs import superframe_check_rs

from signals import music_like, loud_tones


def test_bitres_carried_and_capped():
    cfg = DabPlusConfig(48000, 12, 2)
    enc = DabPlusEncoder(cfg, 1)
    assert enc.bitres_max > 0
    # worst case per superframe must fit the payload area
    assert cfg.num_aus * enc.budget_au + enc.bitres_max \
        <= enc.packer.payload_bits()
    state = enc.init_state()
    assert int(state["bitres"][0]) == 0
    sig = music_like(20)
    spf = cfg.num_aus * 960
    saw_carry = False
    for i in range(3):
        chunk = sig[None, :, i * spf:(i + 1) * spf]
        state, out = enc.encode_superframes(state, chunk, pack=False)
        bits = np.asarray(out["bits"])  # [S, num_aus]
        res = int(np.asarray(state["bitres"])[0])
        assert 0 <= res <= enc.bitres_max
        saw_carry |= res > 0
        # per-superframe usage bounded by budget + max incoming reservoir
        assert bits.sum() <= cfg.num_aus * enc.budget_au + enc.bitres_max
    assert saw_carry  # the reservoir actually accumulates on real audio


def test_bitres_superframes_stay_valid():
    """Transient-heavy audio drawing on the reservoir still packs into
    structurally valid (RS-checked) superframes."""
    cfg = DabPlusConfig(48000, 12, 2)
    enc = DabPlusEncoder(cfg, 1)
    state = enc.init_state()
    sig = loud_tones(24)  # 24*1152 samples ≈ 4.8 superframes
    spf = cfg.num_aus * 960
    for i in range(4):
        chunk = sig[None, :, i * spf:(i + 1) * spf]
        state, frames = enc.encode_superframes(state, chunk, add_rs=True)
        fr = frames[0]
        assert len(fr) == 120 * cfg.subch
        assert superframe_check_rs(np.frombuffer(fr, np.uint8))
