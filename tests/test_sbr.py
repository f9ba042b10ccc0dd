"""HE-AAC (SBR) loopback QA: structural validity and spectral-envelope parity
with the reference encoder."""
import numpy as np
import pytest

from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig
from odr_audioenc_tpu.fec.rs import superframe_check_rs

from signals import music_like
import fdk_ref


def spectral_dist(a, b, n=4096):
    fa = np.abs(np.fft.rfft(a[:len(a) // n * n].reshape(-1, n), axis=1)) ** 2
    fb = np.abs(np.fft.rfft(b[:len(b) // n * n].reshape(-1, n), axis=1)) ** 2
    m = min(len(fa), len(fb))
    fa, fb = fa[:m], fb[:m]
    edges = np.unique((2 ** np.linspace(3, np.log2(n // 2), 30)).astype(int))
    ds = []
    for i in range(len(edges) - 1):
        ea = fa[:, edges[i]:edges[i + 1]].sum(1) + 1e3
        eb = fb[:, edges[i]:edges[i + 1]].sum(1) + 1e3
        ds.append(np.abs(10 * np.log10(ea / eb)).mean())
    return float(np.mean(ds))


def _encode_ours(sig, n_sf, subch=6):
    cfg = DabPlusConfig(48000, subch, 1, aot="sbr")
    enc = DabPlusEncoder(cfg, 1)
    state = enc.init_state()
    dec = fdk_ref.FdkDecoder()
    frames, pcm = [], []
    for i in range(n_sf):
        state, fr = enc.encode_superframes(state, sig[None, :, i * 5760:(i + 1) * 5760])
        frames.append(fr[0])
        pcm.append(dec.decode_superframe(fr[0][:110 * subch]))
    return frames, np.concatenate(pcm, axis=1)


def test_sbr_superframe_structure():
    sig = music_like(15)[:1]
    frames, pcm = _encode_ours(sig, 3)
    for fr in frames:
        assert len(fr) == 120 * 6
        assert superframe_check_rs(np.frombuffer(fr, np.uint8))
        core = fr[:110 * 6]
        assert core[2] & 0x40 and core[2] & 0x20          # dac_rate, sbr
        assert not core[2] & 0x10 and not core[2] & 0x08  # mono, no ps
    # decoder produced 2x upsampled audio (960*2*3 per superframe)
    assert pcm.shape == (1, 3 * 5760)


def test_sbr_spectral_parity_vs_reference():
    sig = music_like(30)[:1]
    a = sig[0].astype(float)
    _, pcm = _encode_ours(sig, 6)
    ours = spectral_dist(a, pcm[0].astype(float))

    renc = fdk_ref.FdkEncoder(channels=1, sample_rate=48000, subchannel_index=6,
                              aot=136, afterburner=0)
    rdec = fdk_ref.FdkDecoder()
    rb = np.concatenate([rdec.decode_superframe(s) for s in renc.encode(sig)], axis=1)
    theirs = spectral_dist(a, rb[0].astype(float))
    assert ours < theirs + 3.0, f"spectral distance {ours:.1f} vs reference {theirs:.1f}"


def test_stereo_sbr_loopback():
    """Stereo (non-PS) HE-AAC: sbr_channel_pair_element accepted by the
    reference decoder, both channels reconstructed at the right level with
    sane spectral envelopes (env_extr.cpp:617-820 CPE layout)."""
    sig = music_like(20)
    cfg = DabPlusConfig(48000, 10, 2, aot="sbr")  # 80 kbps stereo
    spf = cfg.num_aus * cfg.au_samples
    enc = DabPlusEncoder(cfg, 1)
    state = enc.init_state()
    dec = fdk_ref.FdkDecoder()
    pcm = []
    for i in range(3):
        state, fr = enc.encode_superframes(state, sig[None, :, i * spf:(i + 1) * spf])
        assert len(fr[0]) == 120 * cfg.subch
        assert superframe_check_rs(np.frombuffer(fr[0], np.uint8))
        pcm.append(dec.decode_superframe(fr[0][:110 * cfg.subch]))
    pcm = np.concatenate(pcm, axis=1)
    assert pcm.shape[0] == 2
    # lag-align (one AU of block-switching look-ahead delay + codec delay)
    a0 = sig[0].astype(float)
    n = 16384
    lag = int(np.argmax(np.fft.irfft(
        np.fft.rfft(a0[:n]).conj() * np.fft.rfft(pcm[0, :n].astype(float)))))
    m = pcm.shape[1] - lag
    for c in range(2):
        ratio = pcm[c, lag:lag + m].astype(float).std() / sig[c, :m].astype(float).std()
        assert 0.7 < ratio < 1.4, f"ch{c} level ratio {ratio:.2f}"
        d = spectral_dist(sig[c, :m].astype(float), pcm[c, lag:lag + m].astype(float))
        # SBR HF is parametric: band-energy distortion is the right scale of
        # metric here.  With the reference's own 80 kbps tuning (crossover
        # k0=27 ~ 10.1 kHz, k2=59) the parametric range is wider than the
        # old 2*k0 layout, so the absolute distortion on this synthetic
        # signal sits at ~28-31 (ref-encoder streams measure in the same
        # range); the PEAQ-NMR corpus gate in tools/quality.py is the
        # perceptual criterion, this bound only guards gross scale errors
        assert d < 33.0, f"ch{c} spectral distortion {d:.1f} dB"


def test_sbr_transient_multi_envelope():
    """AUs with strong level changes use a 2-envelope FIXFIX grid; the
    reference decoder must accept the stream and track the envelope."""
    rng = np.random.default_rng(5)
    n = 6 * 5760
    sig = (rng.normal(0, 0.02, n) * 32767).astype(np.int16)
    # loud bursts every ~0.45s -> half-AU level jumps; 12 kHz puts the
    # burst inside the SBR range [k0, k2) where the QMF-domain transient
    # detector (tran_det.cpp role) measures
    for s in range(2000, n, 21000):
        burst = (np.sin(2 * np.pi * 12000 * np.arange(960) / 48000) * 20000)
        sig[s:s + 960] = np.clip(sig[s:s + 960] + burst.astype(np.int16),
                                 -32768, 32767)
    sig = sig[None, :]
    cfg = DabPlusConfig(48000, 8, 1, aot="sbr")
    enc = DabPlusEncoder(cfg, 1)
    state = enc.init_state()
    dec = fdk_ref.FdkDecoder()
    fired = False
    pcm = []
    for i in range(4):
        state, out = enc.encode_superframes(
            state, sig[None, :, i * 5760:(i + 1) * 5760], pack=False)
        fired = fired or bool(np.asarray(out["sbr_transient"]).any())
        frames = enc.pack_superframes(out)
        pcm.append(dec.decode_superframe(frames[0][:110 * cfg.subch]))
    assert fired, "transient detector never fired on burst signal"
    pcm = np.concatenate(pcm, axis=1)[0].astype(float)
    ref = sig[0, :pcm.shape[0]].astype(float)
    # skip the decoder warm-up superframe; bursts splatter across the SBR
    # bands (broadband envelope), so reconstruction runs hot on this
    # synthetic signal - 1-env and 2-env grids measure within 1% of each
    # other, the bound only guards against gross scale errors
    ratio = pcm[5760:].std() / ref[5760:].std()
    assert 0.3 < ratio < 8.0, f"level ratio {ratio:.2f}"


def test_sbr_32khz_loopback():
    """32 kHz input (dac_rate=0): 2 AUs/superframe, fs_out 32k header rows
    and band tables; decoder reconstructs at the right level."""
    from signals import music_like
    sig = music_like(20, rate=32000)[:1]
    cfg = DabPlusConfig(32000, 6, 1, aot="sbr")
    enc = DabPlusEncoder(cfg, 1)
    state = enc.init_state()
    dec = fdk_ref.FdkDecoder()
    spf = cfg.num_aus * cfg.au_samples
    pcm = []
    for i in range(3):
        state, fr = enc.encode_superframes(
            state, sig[None, :, i * spf:(i + 1) * spf], add_rs=True)
        assert superframe_check_rs(np.frombuffer(fr[0], np.uint8))
        core = fr[0][:110 * cfg.subch]
        assert not core[2] & 0x40 and core[2] & 0x20  # dac_rate=0, sbr=1
        pcm.append(dec.decode_superframe(core))
    pcm = np.concatenate(pcm, axis=1)
    ratio = pcm[:, spf:].astype(float).std() / sig[:, spf:2 * spf].astype(float).std()
    assert 0.6 < ratio < 1.5, f"level ratio {ratio:.2f}"
