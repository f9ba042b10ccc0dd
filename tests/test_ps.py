"""HE-AAC v2 (Parametric Stereo) loopback QA."""
import numpy as np

from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig
from odr_audioenc_tpu.fec.rs import superframe_check_rs

from signals import music_like
import fdk_ref


def test_ps_loopback_stereo_image():
    sig = music_like(20)
    sig = sig.copy()
    sig[1] = (sig[1].astype(np.int32) * 2 // 5).astype(np.int16)  # pan right down
    cfg = DabPlusConfig(48000, 4, 2, aot="ps")  # 32 kbps stereo
    enc = DabPlusEncoder(cfg, 1)
    state = enc.init_state()
    dec = fdk_ref.FdkDecoder()
    out, frames = [], []
    for i in range(3):
        state, fr = enc.encode_superframes(state, sig[None, :, i * 5760:(i + 1) * 5760])
        frames.append(fr[0])
        out.append(dec.decode_superframe(fr[0][:110 * 4]))
    b = np.concatenate(out, axis=1)
    assert b.shape[0] == 2
    for fr in frames:
        assert len(fr) == 120 * 4
        assert superframe_check_rs(np.frombuffer(fr, np.uint8))
        core = fr[:110 * 4]
        assert core[2] & 0x20 and core[2] & 0x08      # sbr + ps flags
        assert not core[2] & 0x10                     # mono core
    # stereo image: L/R level ratio reproduced within ~3 dB over the
    # lag-aligned region (the encoder carries one AU of block-switching
    # look-ahead delay; the input image is non-stationary, so compare
    # matching time windows)
    a = sig.astype(float)
    bf = b.astype(float)
    n = 16384
    lag = int(np.argmax(np.fft.irfft(
        np.fft.rfft((a[0] + a[1])[:n]).conj() * np.fft.rfft((bf[0] + bf[1])[:n]))))
    m = bf.shape[1] - lag
    in_ratio = a[0, :m].std() / a[1, :m].std()
    out_ratio = bf[0, lag:lag + m].std() / bf[1, lag:lag + m].std()
    assert abs(20 * np.log10(out_ratio / in_ratio)) < 3.0
    # overall level within 3 dB
    lvl = 20 * np.log10(bf[:, lag:lag + m].std() / a[:, :m].std())
    assert abs(lvl) < 3.0


def test_ps_fine_iid_wide_image():
    """Hard-panned content (beyond the coarse +-25 dB grid) selects the
    fine IID ladder (iid_mode 3) and the decoded image follows it."""
    sig = music_like(20).copy()
    sig[1] = (sig[1].astype(np.int32) // 40).astype(np.int16)  # ~-32 dB
    cfg = DabPlusConfig(48000, 4, 2, aot="ps")
    enc = DabPlusEncoder(cfg, 1)
    state = enc.init_state()
    dec = fdk_ref.FdkDecoder()
    out, nfine = [], 0
    for i in range(3):
        state, o = enc.encode_superframes(
            state, sig[None, :, i * 5760:(i + 1) * 5760], pack=False)
        on = {k: np.asarray(v) for k, v in o.items()}
        nfine += int(on["ps_fine"].sum())
        py = enc.pack_superframes(on, use_native=False)[0]
        nat = enc.pack_superframes(on, use_native=True)[0]
        assert py == nat
        out.append(dec.decode_superframe(py[:110 * 4]))
    assert nfine > 0, "fine IID never selected on a 32 dB image"
    b = np.concatenate(out, axis=1).astype(float)
    a = sig.astype(float)
    n = 16384
    lag = int(np.argmax(np.fft.irfft(
        np.fft.rfft((a[0] + a[1])[:n]).conj() * np.fft.rfft((b[0] + b[1])[:n]))))
    m = b.shape[1] - lag
    orr = 20 * np.log10(b[0, lag:lag + m].std() / max(b[1, lag:lag + m].std(), 1e-9))
    assert orr > 27.0, f"decoded image only {orr:.1f} dB (coarse grid caps ~25)"


def test_ps_32khz_loopback():
    """32 kHz HE-AAC v2: dac_rate=0 + ps header flags, 2 AUs/superframe,
    decoder reconstructs stereo at the right level."""
    sig = music_like(20, rate=32000, stereo=True)
    cfg = DabPlusConfig(32000, 4, 2, aot="ps")
    enc = DabPlusEncoder(cfg, 1)
    state = enc.init_state()
    dec = fdk_ref.FdkDecoder()
    spf = cfg.num_aus * cfg.au_samples
    pcm = []
    for i in range(3):
        state, fr = enc.encode_superframes(
            state, sig[None, :, i * spf:(i + 1) * spf], add_rs=True)
        core = fr[0][:110 * cfg.subch]
        assert not core[2] & 0x40 and core[2] & 0x20 and core[2] & 0x08
        pcm.append(dec.decode_superframe(core))
    pcm = np.concatenate(pcm, axis=1)
    assert pcm.shape[0] == 2
    ratio = pcm[:, spf:].astype(float).std() / sig[:, spf:2 * spf].astype(float).std()
    assert 0.6 < ratio < 1.5, f"level ratio {ratio:.2f}"
