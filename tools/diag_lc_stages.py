"""Stage-by-stage psy threshold comparison vs the instrumented reference.

Drives /tmp/fdkout/libfdk-enc-instr2.so (built by /tmp/fdkout/make_psy_instr.py
+ the round-4 adj_thr hook) with FDK_DUMP_PSY, which prints per long-block AU
per band: msMask and, per channel, raw FIXP snapshots of
  t_spr  threshold after SpreadingMax (pre PCM floor)
  t_pcm  threshold after the PCM-quant floor (carries >>THR_SHIFTBITS=4)
  t_pre  threshold after PreEchoControl
  en_lr  L/R band energy (post-TNS, pre stereo processing)
  t_pms  threshold pre stereo processing
  en_ms / t_ms  energy + threshold after MS processing
Purpose: locate WHICH stage elevates fdk's transition-AU thresholds where
ours stay low (the round-4 "unidentified elevation", ROADMAP.md), with the
domain question (M/S vs L/R) resolved by comparing en_lr pre-MS ladders.

Usage: python tools/diag_lc_stages.py [au ...]   (default: the bad AUs)
"""
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, 'tools')
sys.path.insert(0, 'tests')
sys.path.insert(0, '.')

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp  # noqa: E402

LIB = "/tmp/fdkout/libfdk-enc-instr2.so"
DUMP = "/tmp/fdk_psy.txt"
THR_SHIFTBITS = 4


def run_ref(sig):
    import fdk_ref
    if os.path.exists(DUMP):
        os.unlink(DUMP)
    os.environ["FDK_DUMP_PSY"] = DUMP
    fdk_ref.ensure_encoder = lambda: Path(LIB)
    fenc = fdk_ref.FdkEncoder(channels=2, sample_rate=48000,
                              subchannel_index=12,
                              aot=fdk_ref.AOT_DABPLUS_AAC_LC, afterburner=1)
    for _ in fenc.encode(sig):
        pass
    del os.environ["FDK_DUMP_PSY"]
    aus = []
    cur = None
    for line in open(DUMP):
        t = line.split()
        if t[0] == "au":
            cur = {"scale": int(t[2]), "wseq": int(t[4]), "nsfb": int(t[6]),
                   "ms": [], "rows": [[], []]}
            aus.append(cur)
        else:
            cur["ms"].append(int(t[1]))
            vals = [float(v) for v in t[2:]]
            cur["rows"][0].append(vals[:7])
            cur["rows"][1].append(vals[7:])
    for a in aus:
        a["ms"] = np.asarray(a["ms"])
        # [ch, nsfb, 7] raw FIXP (x 2^31); fields:
        # 0 t_spr, 1 t_pcm, 2 t_pre, 3 en_lr, 4 t_pms, 5 en_ms, 6 t_ms
        a["rows"] = np.asarray(a["rows"])
    return aus


def our_stages(sig, aus_needed):
    """Our band energies and stage thresholds for given input windows
    (stateless recompute, long-block path; matches encode.py order)."""
    from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig
    from odr_audioenc_tpu.dabplus import encode as E
    cfg = DabPlusConfig(48000, 12, 2, aot='lc')
    enc = DabPlusEncoder(cfg, 1)
    dt = enc.dtype
    bctx = E.BandCtx(enc.band_m, enc.bol)
    out = {}
    for au in aus_needed:
        prev = sig[None, :, (au - 1) * 960: au * 960].astype(np.float64)
        cur = sig[None, :, au * 960: (au + 1) * 960].astype(np.float64)
        spec = E.mdct_frame(jnp.asarray(prev, dt), jnp.asarray(cur, dt),
                            enc.cos_basis, dt)
        en = np.asarray(bctx.energy(spec))[0]          # [ch, NB]
        base = en * 10.0 ** -2.9
        f_high = np.broadcast_to(np.asarray(enc.pt["f_high"]), en.shape).copy()
        f_low = np.broadcast_to(np.asarray(enc.pt["f_low"]), en.shape).copy()
        t = base.copy()
        NB = en.shape[-1]
        for b in range(1, NB):
            t[..., b] = np.maximum(t[..., b], t[..., b - 1] * f_high[..., b - 1])
        for b in range(NB - 2, -1, -1):
            t[..., b] = np.maximum(t[..., b], t[..., b + 1] * f_low[..., b])
        t_spr = t.copy()
        t_ath = np.maximum(t, np.asarray(enc.pt["ath"]))
        t_pcm = np.maximum(t, np.asarray(enc.pt["pcm_floor"]))
        t_clamp = np.minimum(t_ath, en + 1e30 * (en == 0))
        out[au] = dict(en=en, t_spr=t_spr, t_ath=t_ath, t_pcm=t_pcm,
                       t_clamp=t_clamp)
    return out, enc.max_sfb


def db(x):
    return 10.0 * np.log10(np.maximum(np.asarray(x, np.float64), 1e-30))


def main():
    import signals
    AUS = [int(a) for a in (sys.argv[1:] or [210, 291, 307, 323])]
    per = 12 * 48000 // 3 // 1152 + 1
    sig = np.concatenate([signals.music_like(per), signals.speech_like(per),
                          signals.loud_tones(per)], axis=1)
    ref = run_ref(sig)
    print(f"ref dumped {len(ref)} long AUs")

    # ---- AU alignment: our window index <-> ref dump index, via en ladder
    # correlation over a probe set (resolves fdk's input buffering delay) ----
    probe = list(range(40, min(len(ref) - 2, 340), 20))
    ours, max_sfb = our_stages(sig, [p + d for p in probe for d in (-2, -1, 0, 1, 2)])
    best_d, best_c = 0, -2.0
    for d in (-2, -1, 0, 1, 2):
        cs = []
        for p in probe:
            r = ref[p]
            if r["nsfb"] < 10:
                continue
            en_r = db(r["rows"][0, :max_sfb, 3] / 2**31)  # en_lr raw
            en_u = db(ours[p + d]["en"][0, :max_sfb])
            if np.std(en_r) < 1 or np.std(en_u) < 1:
                continue
            cs.append(np.corrcoef(en_r, en_u)[0, 1])
        c = np.mean(cs) if cs else -2
        print(f"  AU shift {d}: mean en-ladder corr {c:.4f} over {len(cs)}")
        if c > best_c:
            best_c, best_d = c, d
    print(f"alignment: ours[au + {best_d}] ~ ref[au] (corr {best_c:.4f})")

    ours, _ = our_stages(sig, [a + best_d for a in AUS])
    for au in AUS:
        r = ref[au]
        u = ours[au + best_d]
        sc = r["scale"]
        # empirically align the energy scales (median over loud bands)
        en_r = r["rows"][:, :, 3] / 2**31
        sel = en_r[0] > 1e-9
        off = np.median(db(u["en"][0][:len(sel)][sel]) - db(en_r[0][sel])) \
            if sel.any() else 0.0
        print(f"\n=== AU {au} (ours {au + best_d}) wseq {r['wseq']} "
              f"scale {sc} en-off {off:.1f} dB ===")
        print(" b ms | ref: en  t_spr t_pcm t_pre t_pms t_ms(SMR dB rel en) "
              "| ours: en  t_spr t_ath t_clamp")
        for b in range(min(r["nsfb"], max_sfb)):
            row = r["rows"][:, b, :] / 2**31
            en0 = max(row[0, 3], 1e-30)
            print(f"{b:3d} {r['ms'][b]:2d} | "
                  f"{db(row[0, 3]) + off:6.1f} "
                  f"{db(row[0, 0]) - db(en0):6.1f} "
                  f"{db(row[0, 1] * 2**THR_SHIFTBITS) - db(en0):6.1f} "
                  f"{db(row[0, 2] * 2**THR_SHIFTBITS) - db(en0):6.1f} "
                  f"{db(row[0, 4] * 2**THR_SHIFTBITS) - db(en0):6.1f} "
                  f"{db(row[0, 6] * 2**THR_SHIFTBITS) - db(row[0, 5]):6.1f} | "
                  f"{db(u['en'][0, b]):6.1f} "
                  f"{db(u['t_spr'][0, b]) - db(u['en'][0, b]):6.1f} "
                  f"{db(u['t_ath'][0, b]) - db(u['en'][0, b]):6.1f} "
                  f"{db(u['t_clamp'][0, b]) - db(u['en'][0, b]):6.1f}")


if __name__ == "__main__":
    main()
