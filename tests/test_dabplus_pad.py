"""DAB+ PAD-in-DSE: AUs carrying ancillary data still decode, and the DSE
payload round-trips through an AU parse."""
import numpy as np

from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig
from odr_audioenc_tpu.host.dabplus_parse import parse_superframe

from signals import music_like
import fdk_ref


def test_dse_pad_decodes_and_roundtrips():
    sig = music_like(10)
    cfg = DabPlusConfig(48000, 12, 2, pad_len=16)
    enc = DabPlusEncoder(cfg, 1)
    state = enc.init_state()
    dec = fdk_ref.FdkDecoder()
    rng = np.random.default_rng(7)
    pads = [[bytes(rng.integers(1, 255, 8, dtype=np.uint8).tolist())
             for _ in range(cfg.num_aus)]]
    state, frames = enc.encode_superframes(state, sig[None, :, :5760],
                                           add_rs=False, pads=pads)
    parsed = parse_superframe(frames[0])
    assert all(parsed["au_crc_ok"])
    pcm = dec.decode_superframe(frames[0])  # decoder must accept the DSE
    assert pcm.shape[0] == 2
    # the pad bytes appear inside each AU (DSE payload; not byte aligned, so
    # search at every bit shift)
    for a, au in enumerate(parsed["aus"]):
        big = int.from_bytes(bytes(au), "big")
        pat = int.from_bytes(pads[0][a], "big")
        patbits = len(pads[0][a]) * 8
        found = any(((big >> s) & ((1 << patbits) - 1)) == pat
                    for s in range(len(au) * 8 - patbits))
        assert found, f"AU {a}: DSE payload not found"
