"""Per-PEAQ-frame NMR breakdown: which frames carry the LC 96k gap.

Round-3 finding: ~98% of the corpus NMR delta comes from ~10 frames at
loud->digital-silence boundaries (see ROADMAP.md quality section).  Run on
CPU; prints the top offender frames with both encoders' frame NMR and the
source level, plus the share of the gap they carry."""
import jax
jax.config.update("jax_platforms", "cpu")
import sys
root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"
sys.path.insert(0, root + "/tools")
sys.path.insert(0, root + "/tests")
sys.path.insert(0, root)
import os
import numpy as np
import signals
import peaq
import fdk_ref
from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig

per = 12 * 48000 // 3 // 1152 + 1
sig = np.concatenate([signals.music_like(per), signals.speech_like(per),
                      signals.loud_tones(per)], axis=1)

SUBCH = int(os.environ.get("DIAG_SUBCH", "12"))
cfg = DabPlusConfig(48000, SUBCH, 2, aot="lc")
enc = DabPlusEncoder(cfg, 1)
state = enc.init_state()
spf = cfg.num_aus * cfg.au_samples
dec = fdk_ref.FdkDecoder()
ours = []
for i in range(sig.shape[1] // spf):
    state, fr = enc.encode_superframes(state, sig[None, :, i*spf:(i+1)*spf],
                                       add_rs=False)
    ours.append(dec.decode_superframe(fr[0]))
ours = np.concatenate(ours, axis=1)
fenc = fdk_ref.FdkEncoder(channels=2, sample_rate=48000, subchannel_index=SUBCH,
                          aot=fdk_ref.AOT_DABPLUS_AAC_LC, afterburner=1)
fdec = fdk_ref.FdkDecoder()
ref = np.concatenate([fdec.decode_superframe(sf) for sf in fenc.encode(sig)],
                     axis=1)


def nmr_frames(src, test):
    src = src / 32768.0
    test = np.asarray(test, np.float64) / 32768.0
    src_a, test_a = peaq.align(src, test)
    em = peaq.EarModel(48000)
    Xr = em.spectra(src_a)
    Xt = em.spectra(test_a)
    sel = peaq._frame_select(src_a, Xr.shape[0])
    Pn = ((Xr - Xt) ** 2 * em.w2) @ em.U.T
    Es, _ = em.excitation(Xr)
    M = Es * em.mask_w
    nf = (Pn / M).mean(axis=1)
    nf = np.where(sel, nf, 0.0)
    return nf


nf_o = nmr_frames(sig[0].astype(np.float64), ours[0])
nf_r = nmr_frames(sig[0].astype(np.float64), ref[0])
n = min(len(nf_o), len(nf_r))
nf_o, nf_r = nf_o[:n], nf_r[:n]
print("total ours", 10*np.log10(nf_o.mean()), "ref", 10*np.log10(nf_r.mean()))
excess = nf_o - nf_r
order = np.argsort(excess)[::-1]
# PEAQ frame hop: infer
hop = 1024
print("top offender frames (frame, t_sec, ours_nmr_db, ref_nmr_db, src_rms_dbfs):")
for k in order[:15]:
    t0 = k * hop
    seg = sig[0, t0:t0 + 2048].astype(np.float64)
    rms = 20*np.log10(max(np.sqrt((seg/32768.0)**2).mean(), 1e-9))
    print(f"  {k:5d} t={t0/48000.0:6.2f}s ours {10*np.log10(max(nf_o[k],1e-12)):7.1f} "
          f"ref {10*np.log10(max(nf_r[k],1e-12)):7.1f} src_rms {rms:6.1f} dBFS")
cum = np.sort(excess)[::-1]
print("share of gap from top 10/50 frames:",
      cum[:10].sum()/excess.sum(), cum[:50].sum()/excess.sum())
