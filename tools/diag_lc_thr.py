"""Pre-loop psychoacoustic threshold comparison: ours vs the reference's
(instrumented) adj_thr output, per band, on the quality corpus at LC 96k.

Usage: build the instrumented reference first (see ROADMAP / round-3 notes):
the adj_thr.cpp dump hook prints, per AU per channel,
  "au ch C mdctScale M wseq W maxSfb N" then per band
  "b log2(en)/64ld log2(thrFinal) log2(minSnr) log2(thrPsy)" (ld64*64 units).
Pass its .so path as argv[1] (default /tmp/fdkout/libfdk-enc-instr.so).

The scale-free comparison is SMR = log2(thr/en) per band - independent of
the fixed-point normalisation (mdctScale cancels).
"""
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, 'tools')
sys.path.insert(0, 'tests')
sys.path.insert(0, '.')


def run_ref(sig, lib_path, dump_path):
    import fdk_ref
    if os.path.exists(dump_path):
        os.unlink(dump_path)
    os.environ["FDK_DUMP_THR"] = dump_path
    fdk_ref.ensure_encoder = lambda: Path(lib_path)
    fenc = fdk_ref.FdkEncoder(channels=2, sample_rate=48000,
                              subchannel_index=12,
                              aot=fdk_ref.AOT_DABPLUS_AAC_LC, afterburner=1)
    for _ in fenc.encode(sig):
        pass
    del os.environ["FDK_DUMP_THR"]
    # parse: AU-major, ch blocks
    aus = []
    cur = None
    for line in open(dump_path):
        t = line.split()
        if t[0] == "au":
            ch = int(t[2])
            if ch == 0:
                cur = {"mdctScale": int(t[4]), "wseq": int(t[6]),
                       "max_sfb": int(t[8]), "en": [[], []],
                       "thr": [[], []], "minsnr": [[], []],
                       "thr_psy": [[], []], "enfac": [[], []]}
                aus.append(cur)
        else:
            # hook field order: b enFacLd energyLd thresholdLd minSnrLd
            # thrPsySnap (adj_thr_instr.cpp fdk_dump_thr)
            b, enfac, en, thr, msnr, thrp = int(t[0]), *map(float, t[1:6])
            cur["enfac"][ch].append(enfac)
            cur["en"][ch].append(en)
            cur["thr"][ch].append(thr)
            cur["minsnr"][ch].append(msnr)
            cur["thr_psy"][ch].append(thrp)
    return aus


def run_ours(sig):
    from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig
    cfg = DabPlusConfig(48000, 12, 2, aot='lc', afterburner=True)
    enc = DabPlusEncoder(cfg, 1)
    enc.debug_thr = True
    state = enc.init_state()
    spf = cfg.num_aus * cfg.au_samples
    thr, en, wseq = [], [], []
    for i in range(sig.shape[1] // spf):
        chunk = sig[None, :, i * spf:(i + 1) * spf]
        state, out = enc.encode_superframes(state, chunk, pack=False)
        thr.append(np.asarray(out["thr"][0]))    # [nau, ch, NB]
        en.append(np.asarray(out["en"][0]))
        wseq.append(np.asarray(out["wseq"][0]))
    return (np.concatenate(thr), np.concatenate(en), np.concatenate(wseq))


def main():
    import signals
    lib = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/fdkout/libfdk-enc-instr.so"
    per = 12 * 48000 // 3 // 1152 + 1
    sig = np.concatenate([signals.music_like(per), signals.speech_like(per),
                          signals.loud_tones(per)], axis=1)
    ref = run_ref(sig, lib, "/tmp/fdk_thr.txt")
    thr_o, en_o, wseq_o = run_ours(sig)
    print(f"ref {len(ref)} AUs, ours {len(thr_o)} AUs")
    for au in (50, 210, 291, 307, 323):
        r = ref[au]
        max_sfb = r["max_sfb"]
        print(f"=== AU {au}: ref wseq {r['wseq']} ours wseq {wseq_o[au]} "
              f"mdctScale {r['mdctScale']} ===")
        for c in range(2):
            en_r = np.asarray(r["en"][c])[:max_sfb]
            thr_r = np.asarray(r["thr"][c])[:max_sfb]
            thrp_r = np.asarray(r["thr_psy"][c])[:max_sfb]
            smr_r = thr_r - en_r          # log2(thr/en), final
            smrp_r = thrp_r - en_r        # log2(thr/en), psy pre-loop
            en_u = np.maximum(en_o[au, c, :max_sfb], 1e-30)
            smr_u = np.log2(np.maximum(thr_o[au, c, :max_sfb], 1e-30) / en_u)
            # absolute energy alignment (scale offset between domains)
            sel = en_r > -400
            off = np.median(np.log2(en_u)[sel] - en_r[sel]) if sel.any() else 0
            print(f" ch{c} en-scale offset log2={off:.1f}")
            print("  b: en_ref | smr_psy_ref smr_fin_ref | smr_psy_ours")
            for b in range(max_sfb):
                print(f"  {b:2d}: {en_r[b]:8.1f} | {smrp_r[b]:7.1f} "
                      f"{smr_r[b]:7.1f} | {smr_u[b]:7.1f}")


if __name__ == "__main__":
    main()
