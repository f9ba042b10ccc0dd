"""TNS activity comparison: ours vs the reference wire on the LC 96k corpus.

The pre-TNS threshold elevation (see encode.py encode_au) is only correct
if our TNS fires on ~the same AUs with ~the same prediction gain as fdk's;
if we filter more aggressively, thresholds get elevated where fdk's are
not.  Prints per-encoder TNS enable rates and the per-AU disagreement list
with the source level.
"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import sys
sys.path.insert(0, 'tools')
sys.path.insert(0, 'tests')
sys.path.insert(0, '.')
import numpy as np
import signals
import fdk_ref
from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig
from odr_audioenc_tpu.host import dabplus_parse, aacparse

per = 12 * 48000 // 3 // 1152 + 1
sig = np.concatenate([signals.music_like(per), signals.speech_like(per),
                      signals.loud_tones(per)], axis=1)

cfg = DabPlusConfig(48000, 12, 2, aot="lc")
enc = DabPlusEncoder(cfg, 1)
enc.debug_thr = True   # emit en_pre/tns taps
state = enc.init_state()
spf = cfg.num_aus * cfg.au_samples
ours_tns = []   # [au] any-channel tns_en
ours_gain = []
for i in range(sig.shape[1] // spf):
    state, out = enc.encode_superframes(state, sig[None, :, i*spf:(i+1)*spf],
                                        pack=False)
    te = np.asarray(out["tns_en"][0])       # [nau, ch]
    ours_tns.extend(te.any(-1).tolist())
    # elevation actually applied: en_pre/en in TNS range, top band avg
    enp = np.asarray(out["en_pre"][0])      # [nau, ch, NB]
    enn = np.asarray(out["en"][0])
    g = 10*np.log10(np.maximum(enp[:, :, 8:], 1e-12) /
                    np.maximum(enn[:, :, 8:], 1e-12)).mean(axis=(1, 2))
    ours_gain.extend(g.tolist())

fenc = fdk_ref.FdkEncoder(channels=2, sample_rate=48000, subchannel_index=12,
                          aot=fdk_ref.AOT_DABPLUS_AAC_LC, afterburner=1)
ref_tns = []
for sf in fenc.encode(sig):
    for au in dabplus_parse.parse_superframe(sf)["aus"]:
        els = aacparse.parse_au(au)
        t = False
        for el in els:
            for ch in el.get("channels", []):
                if ch.get("tns") is not None:
                    t = True
        ref_tns.append(t)

n = min(len(ours_tns), len(ref_tns))
ours_tns, ref_tns = np.asarray(ours_tns[:n]), np.asarray(ref_tns[:n])
ours_gain = np.asarray(ours_gain[:n])
print(f"AUs: {n}; TNS on: ours {ours_tns.mean():.1%} ref {ref_tns.mean():.1%}")
print(f"agreement {np.mean(ours_tns == ref_tns):.1%}; "
      f"ours-only {np.mean(ours_tns & ~ref_tns):.1%}, "
      f"ref-only {np.mean(ref_tns & ~ours_tns):.1%}")
print(f"our mean TNS elevation (bands 8+, TNS AUs): "
      f"{ours_gain[ours_tns].mean():.1f} dB; on ours-only AUs: "
      f"{ours_gain[ours_tns & ~ref_tns].mean() if (ours_tns & ~ref_tns).any() else 0:.1f} dB")
# loudness profile of disagreements
dis = np.flatnonzero(ours_tns & ~ref_tns)
for k in dis[:20]:
    seg = sig[:, k*960:(k+1)*960].astype(np.float64)
    rms = 10*np.log10(max((seg/32768.0)**2 @ np.ones(1).T if False else
                          ((seg/32768.0)**2).mean(), 1e-12))
    print(f"  ours-only TNS au {k} t={k*960/48000.0:6.2f}s src {rms:6.1f} dBFS "
          f"elev {ours_gain[k]:5.1f} dB")
