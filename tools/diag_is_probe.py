"""Intensity-stereo activity probe: does the reference emit IS books
(14/15) on CLI-reachable forced-LC stereo DAB+ configs?

Round-5 measurement: YES but sparse - ~21 IS-coded bands per 300 AUs
(~0.07% of band slots) on the correlated synthetic corpus at 32-128 kbps
stereo (48 and 32 kHz), ZERO at 192 kbps and zero on decorrelated
(widened) material.  fdk gate: allowIS = useIS && bitrate/bandwidth < 5
(psy_configuration.cpp:739).  Our encoder does not implement IS; at this
incidence the parity impact is nil on the PEAQ corpus - documented in
PARITY.md, open item in ROADMAP.md.
"""
import sys
sys.path.insert(0, '.'); sys.path.insert(0, 'tools'); sys.path.insert(0, 'tests')
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np, signals, fdk_ref
from odr_audioenc_tpu.host import dabplus_parse, aacparse

per = 12 * 48000 // 3 // 1152 + 1
sig = np.concatenate([signals.music_like(per), signals.speech_like(per),
                      signals.loud_tones(per)], axis=1)
# widen stereo image: decorrelate right channel to invite IS
rng = np.random.default_rng(3)
sig2 = sig.copy()
sig2[1] = np.roll(sig2[1], 480) // 2 + (rng.integers(-2000, 2000, sig2.shape[1])).astype(sig2.dtype)

for rate in (48000, 32000):
    for subch in (4, 6, 8, 12, 16, 24):
        for s in (sig, sig2):
            try:
                fenc = fdk_ref.FdkEncoder(channels=2, sample_rate=rate,
                                          subchannel_index=subch,
                                          aot=fdk_ref.AOT_DABPLUS_AAC_LC, afterburner=1)
            except Exception as e:
                print(f"rate {rate} subch {subch}: encoder init failed ({e})"); break
            n_is = n_au = 0
            for sf in fenc.encode(s[:, :rate*6]):
                for au in dabplus_parse.parse_superframe(sf)["aus"]:
                    n_au += 1
                    for el in aacparse.parse_au(au):
                        for ch in el.get("channels", []):
                            bks = ch.get("books")
                            if bks is None: continue
                            flat = [b for grp in (bks if isinstance(bks[0], list) else [bks]) for b in (grp if isinstance(grp, list) else [grp])]
                            n_is += sum(1 for b in flat if b in (14, 15))
            tag = "widened" if s is sig2 else "corpus"
            print(f"LC stereo rate {rate} subch {subch} ({tag}): IS books {n_is} over {n_au} AUs", flush=True)
