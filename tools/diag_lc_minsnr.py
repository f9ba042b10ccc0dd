"""minSnr-cap ladder comparison at chosen AUs: ours (post adapt/modify/MS)
vs the instrumented reference's adj_thr dump (FDK_DUMP_THR field minSnr).

The delivered-noise ground truth (tools/diag_lc_delivered.py) shows fdk
shapes its budget-pressure reduction with the cap ladder - protecting the
sensitive low-mids and erasing upper bands - while ours reduces more
uniformly.  This prints both ladders side by side to port the difference.

Usage: python tools/diag_lc_minsnr.py [au ...]
"""
import os
import sys
from pathlib import Path
sys.path.insert(0, 'tools')
sys.path.insert(0, 'tests')
sys.path.insert(0, '.')
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np
import signals
from diag_lc_thr import run_ref
from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig


def db(x):
    return 10.0 * np.log10(np.maximum(np.asarray(x, np.float64), 1e-30))


AUS = [int(a) for a in sys.argv[1:]] or [226, 242, 371]
per = 12 * 48000 // 3 // 1152 + 1
sig = np.concatenate([signals.music_like(per), signals.speech_like(per),
                      signals.loud_tones(per)], axis=1)
ref = run_ref(sig, "/tmp/fdkout/libfdk-enc-instr2.so", "/tmp/fdk_thr.txt")
print(f"ref {len(ref)} AUs")

cfg = DabPlusConfig(48000, 12, 2, aot='lc')
enc = DabPlusEncoder(cfg, 1)
enc.debug_thr = True
st = enc.init_state()
spf = cfg.num_aus * cfg.au_samples
M, EN, TH, DI = [], [], [], []
for i in range(sig.shape[1] // spf):
    st, out = enc.encode_superframes(st, sig[None, :, i*spf:(i+1)*spf],
                                     pack=False)
    M.append(np.asarray(out["minsnr"][0]))
    EN.append(np.asarray(out["en"][0]))
    TH.append(np.asarray(out["thr"][0]))
    DI.append(np.asarray(out["dist"][0]))
M, EN, TH, DI = map(np.concatenate, (M, EN, TH, DI))

# ld64*64 units in the dump = log2; convert to dB: *10*log10(2)
L2DB = 10.0 * np.log10(2.0)
for au in AUS:
    r = ref[au]
    print(f"\n=== AU {au} (ref) / wire {au+1} (ours) ===")
    print("  b | ref minSnr(dB) SMR_fin | ours minSnr  SMR_dist")
    msfb = r["max_sfb"]
    for b in range(min(msfb, 40)):
        snr_r = r["minsnr"][0][b] * L2DB
        smr_r = (r["thr"][0][b] - r["en"][0][b]) * L2DB
        print(f" {b:3d} | {snr_r:10.1f} {smr_r:8.1f} | "
              f"{db(M[au + 1, 0, b]):8.1f} "
              f"{db(DI[au + 1, 0, b]) - db(EN[au + 1, 0, b]):8.1f}")
