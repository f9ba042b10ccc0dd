"""Perceptual noise substitution: detection, syntax (NOISE_HCB + noise
energy chains), decoder validation and energy accuracy."""
import numpy as np

from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig
from odr_audioenc_tpu.fec.rs import superframe_check_rs

from signals import music_like
import fdk_ref


def _noisy_signal(n):
    rng = np.random.default_rng(1)
    sig = (music_like(20)[:1, :n] * 0.5).astype(np.int32)
    return np.clip(sig + rng.standard_normal(sig.shape) * 2500,
                   -32768, 32767).astype(np.int16)


def test_pns_triggers_and_decodes():
    """Noisy content at 32 kbps mono produces NOISE_HCB bands; the stream
    stays RS-valid, decodes via the reference decoder, and the substituted
    bands come out at the right energy (CPns_Apply scaling contract)."""
    sig = _noisy_signal(4 * 5760)
    cfg = DabPlusConfig(48000, 4, 1)
    enc = DabPlusEncoder(cfg, 1)
    assert enc.pt.get("pns_start") is not None
    state = enc.init_state()
    dec = fdk_ref.FdkDecoder()
    pcm, n_pns = [], 0
    for i in range(4):
        state, out = enc.encode_superframes(
            state, sig[None, :, i * 5760:(i + 1) * 5760], pack=False)
        on = {k: np.asarray(v) for k, v in out.items()}
        n_pns += int((on["books"] == 13).sum())
        py = enc.pack_superframes(on, use_native=False)[0]
        nat = enc.pack_superframes(on, use_native=True)[0]
        assert py == nat, "native PNS syntax diverges from python writer"
        assert superframe_check_rs(np.frombuffer(py, np.uint8))
        pcm.append(dec.decode_superframe(py[:110 * 4]))
    assert n_pns > 20, f"PNS never triggered on noisy content ({n_pns})"
    b = np.concatenate(pcm, axis=1)[0].astype(float)
    a = sig[0].astype(float)
    n = 16384
    lag = int(np.argmax(np.fft.irfft(
        np.fft.rfft(a[:n]).conj() * np.fft.rfft(b[:n]))))
    m = 8192
    fa = np.abs(np.fft.rfft(a[6000:6000 + m] * np.hanning(m))) ** 2
    fb = np.abs(np.fft.rfft(b[lag + 6000:lag + 6000 + m] * np.hanning(m))) ** 2
    fr = np.arange(len(fa)) * 48000 / m
    for lo, hi in [(2000, 4000), (4000, 7000), (7000, 10000)]:
        sel = (fr >= lo) & (fr < hi)
        err = 10 * np.log10(fb[sel].sum() / fa[sel].sum())
        assert abs(err) < 3.0, f"{lo}-{hi} Hz band energy off by {err:.1f} dB"


def test_pns_disabled_at_high_bitrate():
    cfg = DabPlusConfig(48000, 24, 2)  # 192 kbps stereo: 96k/ch
    enc = DabPlusEncoder(cfg, 1)
    assert enc.pt.get("pns_start") is None


def test_pns_not_on_tonal_content():
    """A harmonic signal must not be noise-substituted."""
    t = np.arange(2 * 5760) / 48000
    x = sum(np.sin(2 * np.pi * f * t) / (k + 1)
            for k, f in enumerate([440, 880, 1320, 2200, 3300, 4400, 6600]))
    sig = (x / np.max(np.abs(x)) * 16000).astype(np.int16)[None]
    cfg = DabPlusConfig(48000, 4, 1)
    enc = DabPlusEncoder(cfg, 1)
    state = enc.init_state()
    total = 0
    for i in range(2):
        state, out = enc.encode_superframes(
            state, sig[None, :, i * 5760:(i + 1) * 5760], pack=False)
        total += int((np.asarray(out["books"]) == 13).sum())
    # the harmonics themselves must never be substituted; a handful of
    # tone-SKIRT bands (leakage between harmonics) may read as noise to the
    # chaos measure - fdk rejects those via its stronger spread-masking
    # (en < 1.5*thr), ours currently flags ~1 band/AU there
    assert total <= 12, f"PNS fired on tonal content ({total} bands)"
