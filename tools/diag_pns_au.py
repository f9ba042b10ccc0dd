"""Per-band PNS-detection component dump for a chosen bad transition AU.

Compares our pns_detect inputs (power-distribution flatness, chaos-measure
tonality, audibility en vs thr) against the reference encoder's wire PNS
flags on the same AU, to locate which test blocks our detection where fdk
substitutes (noisedet.cpp:150-240, aacenc_pns.cpp:218-285)."""
import sys

import numpy as np

sys.path.insert(0, 'tools')
sys.path.insert(0, 'tests')
sys.path.insert(0, '.')

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp  # noqa: E402

import fdk_ref  # noqa: E402
import signals  # noqa: E402
from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig  # noqa: E402
from odr_audioenc_tpu.dabplus import encode as E  # noqa: E402
from odr_audioenc_tpu.host import dabplus_parse, aacparse  # noqa: E402

AUS = [int(a) for a in (sys.argv[1:] or [210, 291, 307])]

per = 12 * 48000 // 3 // 1152 + 1
sig = np.concatenate([signals.music_like(per), signals.speech_like(per),
                      signals.loud_tones(per)], axis=1)

cfg = DabPlusConfig(48000, 12, 2, aot='lc', afterburner=True)
enc = DabPlusEncoder(cfg, 1)

# reference wire flags
fenc = fdk_ref.FdkEncoder(channels=2, sample_rate=48000, subchannel_index=12,
                          aot=fdk_ref.AOT_DABPLUS_AAC_LC, afterburner=1)
ref_aus = []
for sf in fenc.encode(sig):
    ref_aus.extend(dabplus_parse.parse_superframe(sf)["aus"])

# AU-index alignment: the reference encoder runs with its own input delay,
# so AU index `au` of the wire does not cover input window au*960 exactly.
# Measure the lag by decoding the reference stream and cross-correlating
# against the source (same method as diag_lc_transitions.align), then shift
# the wire AU index so band comparisons are window-for-window.
dec = fdk_ref.FdkDecoder()
ref_pcm = np.concatenate(
    [dec.decode_superframe(sf) for sf in fenc.encode(sig)], axis=-1)
n = min(48000, ref_pcm.shape[1], sig.shape[1])
c = np.correlate(ref_pcm[0, :n].astype(np.float64),
                 sig[0, :n].astype(np.float64), "full")
lag = int(np.argmax(np.abs(c))) - (n - 1)
au_shift = int(round(-lag / 960.0))
print(f"measured decoder lag {lag} samples -> ref AU shift {au_shift}")

dt = enc.dtype
for au in AUS:
    prev = sig[None, :, (au - 1) * 960: au * 960].astype(np.float64)
    cur = sig[None, :, au * 960: (au + 1) * 960].astype(np.float64)
    spec = E.mdct_frame(jnp.asarray(prev, dt), jnp.asarray(cur, dt),
                        enc.cos_basis, dt)
    bctx = E.BandCtx(enc.band_m, enc.bol)
    en = bctx.energy(spec)
    thr = E.spread_thresholds(en, enc.pt, dt)
    eligible = (jnp.arange(E.NB) < enc.max_sfb)[None, None] & \
        (jnp.arange(E.NB) >= enc.pt["pns_start"])
    nlines = jnp.maximum(enc.band_m.sum(-1), 1.0)
    tabs = enc.pt["pns_tabs"]

    p = spec * spec
    qmask = tabs["qmask"]
    qe = jnp.stack([bctx.reduce_f(p * qmask[i]) for i in range(4)], -1)
    noise_pd = qe.max(-1) * tabs["curve"] < qe.min(-1)
    a = jnp.abs(spec)
    pad = [(0, 0)] * (a.ndim - 1)
    left2 = jnp.pad(a[..., :-2], pad + [(2, 0)], mode="edge")
    right2 = jnp.pad(a[..., 2:], pad + [(0, 2)], mode="edge")
    pred = 0.5 * (left2 + right2)
    chaos = jnp.where(pred < a, (pred / jnp.maximum(a, 1e-20)) ** 2, 1.0)
    taps = (0.75 * 0.25 ** np.arange(12)).astype(np.float64)
    ch_s = sum(taps[i] * jnp.pad(chaos[..., :chaos.shape[-1] - i],
                                 pad + [(i, 0)], mode="edge")
               for i in range(12))
    c_ratio = 2.0 * bctx.reduce_f(p * ch_s) / jnp.maximum(en, 1e-20)
    noise_ton = c_ratio > tabs["ton_thresh"]
    audible = en > 1.5 * thr

    mask_full, _ = E.pns_detect(spec, en, thr, bctx, eligible,
                                nlines[None, None], dt, pns_tabs=tabs)

    ref_idx = min(max(au + au_shift, 0), len(ref_aus) - 1)
    r = aacparse.parse_au(ref_aus[ref_idx])[0]
    print(f"=== au {au} (ref au {ref_idx}, pns_start={enc.pt['pns_start']}, "
          f"max_sfb={enc.max_sfb}) ===")
    if r['info']['window_sequence'] == 2:
        # short-block reference AU: the long-block MDCT features computed
        # above are not band-comparable against the grouped short bands
        print("  ref AU is EIGHT_SHORT - band-for-band comparison invalid, "
              "skipping (rerun with a neighbouring AU index)")
        continue
    for c in range(2):
        ch = r['channels'][c]
        bk = ch['books'][0] if isinstance(ch['books'][0], list) else ch['books']
        ref_pns = [1 if b == 13 else 0 for b in bk]
        print(f" ch{c} band: " + " ".join(f"{b:5d}" for b in range(20, enc.max_sfb)))
        print(f"  ref_pns : " + " ".join(
            f"{(ref_pns[b] if b < len(ref_pns) else -1):5d}"
            for b in range(20, enc.max_sfb)))
        print(f"  ours_pns: " + " ".join(
            f"{int(mask_full[0, c, b]):5d}" for b in range(20, enc.max_sfb)))
        print(f"  pd_flat : " + " ".join(
            f"{int(noise_pd[0, c, b]):5d}" for b in range(20, enc.max_sfb)))
        print(f"  c_ratio : " + " ".join(
            f"{float(c_ratio[0, c, b]):5.2f}" for b in range(20, enc.max_sfb)))
        print(f"  audible : " + " ".join(
            f"{int(audible[0, c, b]):5d}" for b in range(20, enc.max_sfb)))
        print(f"  en_db   : " + " ".join(
            f"{10*np.log10(max(float(en[0, c, b]), 1e-12)):5.0f}"
            for b in range(20, enc.max_sfb)))
