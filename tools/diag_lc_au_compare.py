"""Side-by-side per-AU dump at chosen AUs: our live encoder taps vs the
instrumented reference psy dump (run tools/diag_lc_stages.py first or let
this regenerate /tmp/fdk_psy.txt).

Prints, per band: our en_pre/en/thr (rel dB) + TNS state vs ref msMask,
tnsGain (en_pre_tns/en_lr), final psy SMR (t_ms rel en_ms).

Usage: python tools/diag_lc_au_compare.py [au ...]
"""
import os
import sys

sys.path.insert(0, 'tools')
sys.path.insert(0, 'tests')
sys.path.insert(0, '.')

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np

import signals
from diag_lc_stages import run_ref, db, THR_SHIFTBITS
from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig

AUS = [int(a) for a in sys.argv[1:]] or [368, 369, 370, 371, 372]

per = 12 * 48000 // 3 // 1152 + 1
sig = np.concatenate([signals.music_like(per), signals.speech_like(per),
                      signals.loud_tones(per)], axis=1)

ref = run_ref(sig)

cfg = DabPlusConfig(48000, 12, 2, aot="lc")
enc = DabPlusEncoder(cfg, 1)
enc.debug_thr = True
state = enc.init_state()
spf = cfg.num_aus * cfg.au_samples
O = {"thr": [], "en": [], "en_pre": [], "wseq": [], "tns": [], "tns_o": []}
for i in range(sig.shape[1] // spf):
    state, out = enc.encode_superframes(state, sig[None, :, i*spf:(i+1)*spf],
                                        pack=False)
    O["thr"].append(np.asarray(out["thr"][0]))
    O["en"].append(np.asarray(out["en"][0]))
    O["en_pre"].append(np.asarray(out["en_pre"][0]))
    O["wseq"].append(np.asarray(out["wseq"][0]))
    O["tns"].append(np.asarray(out["tns_en"][0]))
    O["tns_o"].append(np.asarray(out["tns_order"][0]))
O = {k: np.concatenate(v) for k, v in O.items()}

for au in AUS:
    r = ref[au]
    print(f"\n=== AU {au} t={au*960/48000.0:.2f}s | ref wseq {r['wseq']} "
          f"| ours wseq {O['wseq'][au]} tns {O['tns'][au]} "
          f"order {O['tns_o'][au]} ===")
    if not r["nsfb"]:
        print("  (ref short block - no band dump)")
    src = sig[:, au*960:(au+1)*960].astype(np.float64)
    print(f"  src rms {db((src/32768.0**1)**2).mean():.0f} (int16^2 dB)")
    print("  b | ref tnsGn  SMR_fin  ms || ours tnsGn  SMR  (en_pre_db)")
    nb = r["nsfb"] if r["nsfb"] else 40
    for b in range(min(nb, 40)):
        if r["nsfb"]:
            row = r["rows"][:, b, :]
            gn_r = db(max(row[0, 8], 1e-30)) - db(max(row[0, 3], 1e-30)) - 6.02
            smr_r = db(row[0, 6]) - db(max(row[0, 5], 1e-30))
            msf = r["ms"][b]
        else:
            gn_r = smr_r = np.nan
            msf = -1
        gn_u = db(O["en_pre"][au, 0, b]) - db(O["en"][au, 0, b])
        smr_u = db(O["thr"][au, 0, b]) - db(O["en"][au, 0, b])
        print(f" {b:3d} | {gn_r:7.1f} {smr_r:8.1f} {msf:3d} || "
              f"{gn_u:7.1f} {smr_u:6.1f}  ({db(O['en_pre'][au, 0, b]):6.1f})")
