"""Stage-by-stage psy threshold comparison vs the instrumented reference.

Drives /tmp/fdkout/libfdk-enc-instr2.so (built by /tmp/fdkout/make_psy_instr.py
+ the round-4 adj_thr hook) with FDK_DUMP_PSY, which prints one header per
encode AU (long or short) and, for long stereo AUs, per band: msMask and per
channel raw FIXP snapshots of
  t_spr  threshold after SpreadingMax (pre PCM floor)
  t_pcm  threshold after the PCM-quant floor (carries >>THR_SHIFTBITS=4)
  t_pre  threshold after PreEchoControl
  en_lr  L/R band energy (post-TNS, pre stereo processing)
  t_pms  threshold pre stereo processing
  en_ms / t_ms  energy + threshold after MS processing
Purpose: locate WHICH stage elevates fdk's transition-AU thresholds where
ours stay low (the round-4 "unidentified elevation", ROADMAP.md), with the
domain question (M/S vs L/R) resolved by comparing en_lr pre-MS ladders.

The fdk psy input carries a sample-granular delay (not an AU multiple); a
sweep aligns our analysis windows to it before comparing (printed; reuse
with --offset N to skip the sweep).

Usage: python tools/diag_lc_stages.py [--offset N] [au ...]
(default AUs: auto-detected loud->silence transition AUs)
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
            cur["rows"][0].append(vals[:9])
            cur["rows"][1].append(vals[9:])
    for a in aus:
        a["ms"] = np.asarray(a["ms"])
        # [ch, nsfb, 9] raw FIXP; fields:
        # 0 t_spr, 1 t_pcm, 2 t_pre, 3 en_lr, 4 t_pms, 5 en_ms, 6 t_ms,
        # 7 t_pre_spr, 8 en_pre_tns
        # thr scale: fields 0,7 carry a x2^THR_SHIFTBITS pre-shift
        # (C_RATIO define); fields 1,2,4,6 have it removed (>>4 at the
        # PCM-floor stage); energies (3,5,8) are unshifted.
        a["rows"] = np.asarray(a["rows"], np.float64)
    return aus


class OurPsy:
    def __init__(self):
        from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig
        from odr_audioenc_tpu.dabplus import encode as E
        self.E = E
        cfg = DabPlusConfig(48000, 12, 2, aot='lc')
        self.enc = DabPlusEncoder(cfg, 1)
        self.bctx = E.BandCtx(self.enc.band_m, self.enc.bol)
        self.max_sfb = self.enc.max_sfb

    def stages(self, sig, start):
        """Band energies/stage thresholds for the long window whose second
        half starts at sample `start` (MDCT over [start-960, start+960))."""
        E, enc, dt = self.E, self.enc, self.enc.dtype
        lo, hi = start - 960, start + 960
        if lo < 0 or hi > sig.shape[1]:
            z = np.zeros((2, E.NB))
            return dict(en=z + 1e-30, t_spr=z, t_ath=z, t_clamp=z)
        prev = sig[None, :, lo:start].astype(np.float64)
        cur = sig[None, :, start:hi].astype(np.float64)
        spec = E.mdct_frame(jnp.asarray(prev, dt), jnp.asarray(cur, dt),
                            enc.cos_basis, dt)
        en = np.asarray(self.bctx.energy(spec))[0]          # [ch, NB]
        base = en * 10.0 ** -2.9
        f_high = np.asarray(enc.pt["f_high"])
        f_low = np.asarray(enc.pt["f_low"])
        t = base.copy()
        NB = en.shape[-1]
        for b in range(1, NB):
            t[..., b] = np.maximum(t[..., b], t[..., b - 1] * f_high[b - 1])
        for b in range(NB - 2, -1, -1):
            t[..., b] = np.maximum(t[..., b], t[..., b + 1] * f_low[b])
        t_spr = t.copy()
        t_ath = np.maximum(t, np.asarray(enc.pt["ath"]))
        t_clamp = np.minimum(t_ath, en + 1e30 * (en == 0))
        return dict(en=en, t_spr=t_spr, t_ath=t_ath, t_clamp=t_clamp)


def db(x):
    return 10.0 * np.log10(np.maximum(np.asarray(x, np.float64), 1e-30))


def main():
    import signals
    args = sys.argv[1:]
    offset = None
    if args and args[0] == "--offset":
        offset = int(args[1])
        args = args[2:]
    per = 12 * 48000 // 3 // 1152 + 1
    sig = np.concatenate([signals.music_like(per), signals.speech_like(per),
                          signals.loud_tones(per)], axis=1)
    ref = run_ref(sig)
    n_long = sum(1 for a in ref if a["nsfb"])
    print(f"ref dumped {len(ref)} AUs ({n_long} long)")
    ours = OurPsy()
    max_sfb = ours.max_sfb

    # probe AUs: long, non-silent, decently structured
    probes = [i for i in range(20, len(ref) - 2)
              if ref[i]["nsfb"] and np.max(ref[i]["rows"][0, :, 3]) > 1e5]
    probes = probes[:: max(1, len(probes) // 25)]

    def mean_corr(d):
        cs = []
        for p in probes:
            en_r = db(ref[p]["rows"][0, :max_sfb, 3])
            u = ours.stages(sig, p * 960 + d)
            en_u = db(u["en"][0][:max_sfb])
            if np.std(en_r) < 1 or np.std(en_u) < 1:
                continue
            cs.append(np.corrcoef(en_r, en_u)[0, 1])
        return float(np.mean(cs)) if cs else -2.0

    if offset is None:
        best = max(((mean_corr(d), d) for d in range(-1920, 1921, 120)),
                   key=lambda t: t[0])
        # refine around the coarse winner
        best = max(((mean_corr(d), d)
                    for d in range(best[1] - 120, best[1] + 121, 30)),
                   key=lambda t: t[0])
        offset = best[1]
        print(f"alignment: our window start = ref_au*960 + {offset} "
              f"(corr {best[0]:.4f})")
    else:
        print(f"alignment: using --offset {offset} (corr {mean_corr(offset):.4f})")

    if args:
        AUS = [int(a) for a in args]
    else:
        # auto-pick loud->silence transition AUs from the aligned source
        AUS = []
        for i in range(2, len(ref) - 2):
            if not ref[i]["nsfb"]:
                continue
            s0 = sig[:, max(i * 960 + offset - 960, 0): i * 960 + offset]
            s1 = sig[:, i * 960 + offset: i * 960 + offset + 960]
            if s0.size and s1.size:
                r0 = np.sqrt(np.mean(s0.astype(np.float64) ** 2) + 1e-12)
                r1 = np.sqrt(np.mean(s1.astype(np.float64) ** 2) + 1e-12)
                if db(r0 ** 2) > 55 and db(r1 ** 2) < 25:  # loud -> quiet
                    AUS.append(i)
        AUS = AUS[:6]
        print(f"transition AUs: {AUS}")

    for au in AUS:
        r = ref[au]
        u = ours.stages(sig, au * 960 + offset)
        sc = r["scale"]
        en_r = r["rows"][:, :, 3]
        sel = en_r[0] > 1e3
        off_db = np.median(db(u["en"][0][:en_r.shape[1]][sel]) - db(en_r[0][sel])) \
            if sel.any() else 0.0
        print(f"\n=== ref AU {au} wseq {r['wseq']} scale {sc} "
              f"en-off {off_db:.1f} dB ===")
        print(" b ms | ref: en tnsGn | t0 t_spr t_pcm t_pre t_pms t_ms "
              "(SMR dB rel post-TNS en) | ours: en  t_spr t_ath t_clamp")
        SB = 2.0 ** THR_SHIFTBITS
        for b in range(min(r["nsfb"], max_sfb)):
            row = r["rows"][:, b, :]
            en0 = max(row[0, 3], 1e-30)
            print(f"{b:3d} {r['ms'][b]:2d} | "
                  f"{db(row[0, 3]) + off_db:6.1f} "
                  f"{db(max(row[0, 8], 1e-30)) - db(en0):5.1f} | "
                  f"{db(row[0, 7] / SB) - db(en0):6.1f} "
                  f"{db(row[0, 0] / SB) - db(en0):6.1f} "
                  f"{db(row[0, 1]) - db(en0):6.1f} "
                  f"{db(row[0, 2]) - db(en0):6.1f} "
                  f"{db(row[0, 4]) - db(en0):6.1f} "
                  f"{db(row[0, 6]) - db(max(row[0, 5], 1e-30)):6.1f} | "
                  f"{db(u['en'][0, b]):6.1f} "
                  f"{db(u['t_spr'][0, b]) - db(u['en'][0, b]):6.1f} "
                  f"{db(u['t_ath'][0, b]) - db(u['en'][0, b]):6.1f} "
                  f"{db(u['t_clamp'][0, b]) - db(u['en'][0, b]):6.1f}")


if __name__ == "__main__":
    main()
