"""Per-band wire comparison for selected bad AUs: scf ladders + books."""
import sys
import numpy as np
sys.path.insert(0, 'tools'); sys.path.insert(0, 'tests'); sys.path.insert(0, '.')
import fdk_ref, signals
from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig
from odr_audioenc_tpu.host import dabplus_parse, aacparse

per = 12 * 48000 // 3 // 1152 + 1
sig = np.concatenate([signals.music_like(per), signals.speech_like(per),
                      signals.loud_tones(per)], axis=1)

cfg = DabPlusConfig(48000, 12, 2, aot='lc', afterburner=True)
enc = DabPlusEncoder(cfg, 1)
state = enc.init_state()
spf = cfg.num_aus * cfg.au_samples
n_sf = sig.shape[1] // spf
ours_aus = []
for i in range(n_sf):
    chunk = sig[None, :, i * spf:(i + 1) * spf]
    state, frames = enc.encode_superframes(state, chunk, add_rs=False)
    ours_aus.extend(dabplus_parse.parse_superframe(frames[0])["aus"])

fenc = fdk_ref.FdkEncoder(channels=2, sample_rate=48000, subchannel_index=12,
                          aot=fdk_ref.AOT_DABPLUS_AAC_LC, afterburner=1)
ref_aus = []
for sf in fenc.encode(sig):
    ref_aus.extend(dabplus_parse.parse_superframe(sf)["aus"])

for au in (210, 291, 307):
    o = aacparse.parse_au(ours_aus[au])[0]
    r = aacparse.parse_au(ref_aus[au])[0]
    print(f'=== au {au} ===')
    for tag, p in (('OURS', o), ('REF ', r)):
        for c in range(2):
            ch = p['channels'][c]
            sf = ch['sf'][0] if isinstance(ch['sf'][0], list) else ch['sf']
            bk = ch['books'][0] if isinstance(ch['books'][0], list) else ch['books']
            qs = ch.get('q')
            print(f'{tag} ch{c} gg={ch["global_gain"]} '
                  f'tns={ch["tns"] is not None}')
            print('   sf:', ' '.join('   .' if v is None else f'{v:4d}' for v in sf))
            print('   bk:', ' '.join(f'{v:4d}' for v in bk))
    # per-band dequantized energies for ch0
    for tag, p, aus in (('OURS', o, ours_aus), ('REF ', r, ref_aus)):
        ch = p['channels'][0]
        q = np.asarray(ch['q'], dtype=np.float64)
        sf = ch['sf'][0] if isinstance(ch['sf'][0], list) else ch['sf']
        from odr_audioenc_tpu.dabplus import tables as AT
        off = AT.sfb_offsets(48000)
        en = []
        for b in range(len(sf)):
            lo, hi = off[b], off[b + 1]
            sfv = sf[b] if sf[b] is not None else -10000
            x = np.abs(q[lo:hi]) ** (4 / 3) * 2.0 ** (0.25 * (float(sfv) - 100))
            en.append(10 * np.log10(max((x ** 2).sum(), 1e-12)))
        print(f'{tag} ch0 deq band dB:',
              ' '.join(f'{v:5.0f}' for v in en[:40]))
print('done')
