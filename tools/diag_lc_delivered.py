"""Delivered per-band noise comparison at chosen AU windows: decode BOTH
encoders, subtract the aligned source, MDCT the residual over the AU's
window, and print band noise ladders side by side (plus our taps: psy thr
and counted dist).  Ground truth for WHERE the transition-frame noise gap
lives - independent of any internal threshold bookkeeping.

Usage: python tools/diag_lc_delivered.py [subch] [au ...]
"""
import os
import sys
sys.path.insert(0, 'tools')
sys.path.insert(0, 'tests')
sys.path.insert(0, '.')
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
import numpy as np
import signals
import fdk_ref
from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig
from odr_audioenc_tpu.dabplus import encode as E


def db(x):
    return 10.0 * np.log10(np.maximum(np.asarray(x, np.float64), 1e-30))


def main():
    args = sys.argv[1:]
    subch = int(args[0]) if args else 12
    AUS = [int(a) for a in args[1:]] or [225, 226, 227]
    per = 12 * 48000 // 3 // 1152 + 1
    sig = np.concatenate([signals.music_like(per), signals.speech_like(per),
                          signals.loud_tones(per)], axis=1)
    cfg = DabPlusConfig(48000, subch, 2, aot='lc')
    enc = DabPlusEncoder(cfg, 1)
    enc.debug_thr = True
    st = enc.init_state()
    spf = cfg.num_aus * cfg.au_samples
    thr_t, en_t, dist_t = [], [], []
    for i in range(sig.shape[1] // spf):
        st, out = enc.encode_superframes(st, sig[None, :, i*spf:(i+1)*spf],
                                         pack=False)
        thr_t.append(np.asarray(out["thr"][0]))
        en_t.append(np.asarray(out["en"][0]))
        dist_t.append(np.asarray(out["dist"][0]))
    thr_t = np.concatenate(thr_t)
    en_t = np.concatenate(en_t)
    dist_t = np.concatenate(dist_t)

    enc2 = DabPlusEncoder(cfg, 1)
    st = enc2.init_state()
    dec = fdk_ref.FdkDecoder()
    ours = []
    for i in range(sig.shape[1] // spf):
        st, fr = enc2.encode_superframes(st, sig[None, :, i*spf:(i+1)*spf],
                                         add_rs=False)
        ours.append(dec.decode_superframe(fr[0]))
    ours = np.concatenate(ours, -1)
    fenc = fdk_ref.FdkEncoder(channels=2, sample_rate=48000,
                              subchannel_index=subch,
                              aot=fdk_ref.AOT_DABPLUS_AAC_LC, afterburner=1)
    dec2 = fdk_ref.FdkDecoder()
    ref = np.concatenate([dec2.decode_superframe(sf)
                          for sf in fenc.encode(sig)], -1)

    def lag_of(d):
        n = 2 * 48000
        c = np.correlate(d[0, :n].astype(np.float64),
                         sig[0, :n].astype(np.float64), "full")
        return int(np.argmax(np.abs(c))) - (n - 1)
    lo_, lr_ = lag_of(ours), lag_of(ref)
    print(f"lags ours {lo_} ref {lr_}")

    basis = np.asarray(enc.cos_basis, np.float64)
    bm = np.asarray(enc.band_m, np.float64)

    def band_noise(decoded, lag, au):
        a, b = (au - 1) * 960, (au + 1) * 960
        d = decoded[:2, a + lag:b + lag].astype(np.float64)
        s = sig[:, a:b].astype(np.float64)
        r = (d - s) @ basis                    # [ch, 960] residual MDCT
        return (r * r) @ bm.T                  # [ch, NB]

    for au in AUS:
        no = band_noise(ours, lo_, au)
        nr = band_noise(ref, lr_, au)
        print(f"\n=== AU window {au} (t={au*960/48000.0:.2f}s) : per-band "
              f"noise dB (ch0) ===")
        print("  b | ours_noise ref_noise  diff | our_en our_thr our_dist "
              "(taps at wire au {})".format(au + 1))
        for b in range(40):
            print(f" {b:3d} | {db(no[0, b]):8.1f} {db(nr[0, b]):8.1f} "
                  f"{db(no[0, b]) - db(nr[0, b]):6.1f} | "
                  f"{db(en_t[au + 1, 0, b]):6.1f} "
                  f"{db(thr_t[au + 1, 0, b]):6.1f} "
                  f"{db(dist_t[au + 1, 0, b]):6.1f}")


if __name__ == "__main__":
    main()
