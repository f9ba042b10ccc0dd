"""DAB+ AAC-LC end-to-end: structural validity, RS, and loopback quality via
the reference fdk decoder (the reference's own QA criterion, --decode)."""
import numpy as np
import pytest

from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig
from odr_audioenc_tpu.fec.rs import superframe_check_rs
from odr_audioenc_tpu.host.aacpack import firecode_crc, crc16_ccitt

from signals import music_like, loud_tones
import fdk_ref


def _roundtrip(cfg, sig, n_superframes):
    enc = DabPlusEncoder(cfg, 1)
    state = enc.init_state()
    dec = fdk_ref.FdkDecoder()
    spf = cfg.num_aus * 960
    frames, pcm = [], []
    for i in range(n_superframes):
        chunk = sig[None, :, i * spf:(i + 1) * spf]
        state, fr = enc.encode_superframes(state, chunk, add_rs=True)
        frames.append(fr[0])
        pcm.append(dec.decode_superframe(fr[0][:cfg.subch * 110]))
    return frames, np.concatenate(pcm, axis=1)


def _snr(a, b, n=32768, m=20000):
    lag = int(np.argmax(np.fft.irfft(np.fft.rfft(a[:n]).conj() * np.fft.rfft(b[:n]))))
    err = a[:m] - b[lag:lag + m]
    return 20 * np.log10(a[:m].std() / max(err.std(), 1e-9))


def test_superframe_structure_and_rs():
    cfg = DabPlusConfig(48000, 12, 2)
    sig = music_like(15)[:, :3 * 5760]
    frames, _ = _roundtrip(cfg, sig, 3)
    for fr in frames:
        assert len(fr) == 120 * cfg.subch
        assert superframe_check_rs(np.frombuffer(fr, np.uint8))
        core = fr[:110 * cfg.subch]
        # firecode over bytes 2..10 matches bytes 0..1
        assert firecode_crc(core[2:11]) == (core[0] << 8 | core[1])
        # header flags: dac_rate=1, sbr=0, stereo, no ps
        assert core[2] & 0x40 and not core[2] & 0x20
        assert core[2] & 0x10 and not core[2] & 0x08


@pytest.mark.parametrize("rate,subch,ch", [
    (48000, 12, 2),   # AAC-LC stereo 96 kbps
    (48000, 14, 2),   # 112 kbps
    (48000, 16, 1),   # mono 128 kbps
    (32000, 12, 2),   # 32 kHz (4 AUs)
])
def test_loopback_decodes(rate, subch, ch):
    cfg = DabPlusConfig(rate, subch, ch)
    spf = cfg.num_aus * 960
    sig = music_like(40, stereo=(ch == 2), rate=rate)
    if ch == 1:
        sig = sig[:1]
    nsf = sig.shape[1] // spf
    nsf = min(nsf, 4)
    frames, pcm = _roundtrip(cfg, sig[:, :nsf * spf], nsf)
    assert pcm.shape[0] == ch
    # energy should be in the right ballpark (decoder produced real audio)
    assert 0.3 < pcm.astype(float).std() / sig.astype(float).std() < 1.7


def test_loopback_quality_music():
    cfg = DabPlusConfig(48000, 12, 2)
    sig = music_like(30)
    frames, pcm = _roundtrip(cfg, sig[:, :6 * 5760], 6)
    snr = _snr(sig[0].astype(float), pcm[0].astype(float))
    assert snr > 20.0, f"music SNR too low: {snr:.1f} dB"


def test_loopback_quality_vs_reference():
    """Within a few dB of the reference encoder (afterburner off) on music."""
    cfg = DabPlusConfig(48000, 12, 2)
    sig = music_like(30)
    _, pcm = _roundtrip(cfg, sig[:, :6 * 5760], 6)
    ours = _snr(sig[0].astype(float), pcm[0].astype(float))

    renc = fdk_ref.FdkEncoder(channels=2, sample_rate=48000, subchannel_index=12,
                              aot=135, afterburner=0)
    rdec = fdk_ref.FdkDecoder()
    rb = np.concatenate([rdec.decode_superframe(s) for s in renc.encode(sig)], axis=1)
    theirs = _snr(sig[0].astype(float), rb[0].astype(float))
    assert ours > theirs - 6.0, f"ours {ours:.1f} dB vs reference {theirs:.1f} dB"
