"""Codec quality measurement: ours vs the reference fdk-aac encoder through
the PEAQ ear model (tools/peaq.py).

Both encoders consume the same PCM; both bitstreams are decoded by the same
compiled reference decoder (the loopback QA path of src/AACDecoder.cpp);
each decode is compared against the source with PEAQ MOVs.  Parity gate:
NMR_ours <= NMR_ref + margin (see peaq.py docstring for why parity on MOVs
stands in for the ODG delta).
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import fdk_ref   # noqa: E402
import peaq      # noqa: E402


def measure_point(rate, subch, channels, aot, sig, afterburner=True):
    """Encode `sig` ([ch, n] int16) with ours and with the reference fdk
    encoder, decode both through the reference decoder, PEAQ-compare each
    against the source.  Returns dict with ours/ref MOV dicts."""
    from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig

    cfg = DabPlusConfig(rate, subch, channels, aot=aot,
                        afterburner=afterburner)
    enc = DabPlusEncoder(cfg, 1)
    state = enc.init_state()
    spf = cfg.num_aus * cfg.au_samples
    n_sf = sig.shape[1] // spf
    dec = fdk_ref.FdkDecoder()
    ours_pcm = []
    for i in range(n_sf):
        chunk = sig[None, :, i * spf:(i + 1) * spf]
        state, frames = enc.encode_superframes(state, chunk, add_rs=False)
        ours_pcm.append(dec.decode_superframe(frames[0]))
    ours_pcm = np.concatenate(ours_pcm, axis=1)

    aot_id = {"lc": fdk_ref.AOT_DABPLUS_AAC_LC, "sbr": fdk_ref.AOT_DABPLUS_SBR,
              "ps": fdk_ref.AOT_DABPLUS_PS}[aot]
    fenc = fdk_ref.FdkEncoder(channels=channels, sample_rate=rate,
                              subchannel_index=subch, aot=aot_id,
                              afterburner=1 if afterburner else 0)
    fdec = fdk_ref.FdkDecoder()
    ref_pcm = []
    for sf in fenc.encode(sig):
        ref_pcm.append(fdec.decode_superframe(sf))
    ref_pcm = np.concatenate(ref_pcm, axis=1)

    # decoded channel counts can exceed the source for mono SBR (decoder
    # upmix) - compare against the matching source channels
    n_ch = min(channels, ours_pcm.shape[0], ref_pcm.shape[0])
    src = sig[:n_ch]
    ours = peaq.compare_stereo(src, ours_pcm[:n_ch], rate)
    ref = peaq.compare_stereo(src, ref_pcm[:n_ch], rate)
    return dict(rate=rate, subch=subch, channels=channels, aot=aot,
                ours=ours, ref=ref,
                nmr_delta=ours["nmr_db"] - ref["nmr_db"])


OPERATING_POINTS = [
    # (rate, subch, channels, aot)      BASELINE configs 2-4, 3 bitrates each
    (48000, 12, 2, "lc"),   # 96 kbps stereo  (config 2)
    (48000, 14, 2, "lc"),   # 112 kbps
    (48000, 16, 2, "lc"),   # 128 kbps
    (48000, 4, 1, "sbr"),   # 32 kbps mono    (config 3 family)
    (48000, 6, 1, "sbr"),   # 48 kbps mono    (config 3)
    (48000, 8, 1, "sbr"),   # 64 kbps mono
    (48000, 3, 2, "ps"),    # 24 kbps stereo  (config 4 family)
    (48000, 4, 2, "ps"),    # 32 kbps stereo  (config 4)
    (48000, 6, 2, "ps"),    # 48 kbps stereo
]


def corpus(seconds=12):
    """Mixed synthetic corpus: tonal music-like + speech-like + transient
    segments concatenated (tests/signals.py generators)."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    import signals
    per = seconds * 48000 // 3 // 1152 + 1
    parts = [signals.music_like(per), signals.speech_like(per),
             signals.loud_tones(per)]
    return np.concatenate(parts, axis=1)


def main():
    import json
    sig = corpus()
    rows = []
    print("| rate | kbps | ch | AOT | NMR ours (dB) | NMR ref (dB) | delta |"
          " BW ours | BW ref |")
    print("|---|---|---|---|---|---|---|---|---|")
    for (rate, subch, ch, aot) in OPERATING_POINTS:
        s = sig[:ch] if ch == 1 else sig
        r = measure_point(rate, subch, ch, aot, s)
        rows.append(r)
        print(f"| {rate} | {subch*8} | {ch} | {aot} | "
              f"{r['ours']['nmr_db']:.2f} | {r['ref']['nmr_db']:.2f} | "
              f"{r['nmr_delta']:+.2f} | {r['ours']['bw_test_bins']:.0f} | "
              f"{r['ref']['bw_test_bins']:.0f} |", flush=True)
    Path(".scratch/quality_report.json").write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
