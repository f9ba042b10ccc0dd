"""LC 96k transition-frame diagnostic: per-192-sample error profiles for
ours vs the reference, plus parsed AU decisions at the worst spans."""
import sys, time
from pathlib import Path
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
dec = fdk_ref.FdkDecoder()
ours_pcm, ours_aus = [], []
for i in range(n_sf):
    chunk = sig[None, :, i * spf:(i + 1) * spf]
    state, frames = enc.encode_superframes(state, chunk, add_rs=False)
    ours_pcm.append(dec.decode_superframe(frames[0]))
    ours_aus.extend(dabplus_parse.parse_superframe(frames[0])["aus"])
ours_pcm = np.concatenate(ours_pcm, axis=1)

fenc = fdk_ref.FdkEncoder(channels=2, sample_rate=48000, subchannel_index=12,
                          aot=fdk_ref.AOT_DABPLUS_AAC_LC, afterburner=1)
fdec = fdk_ref.FdkDecoder()
ref_pcm, ref_aus = [], []
for sf in fenc.encode(sig):
    ref_pcm.append(fdec.decode_superframe(sf))
    ref_aus.extend(dabplus_parse.parse_superframe(sf)["aus"])
ref_pcm = np.concatenate(ref_pcm, axis=1)


def align(dec_pcm, src):
    n = min(dec_pcm.shape[1], src.shape[1], 96000)
    c = np.correlate(dec_pcm[0, :n].astype(np.float64),
                     src[0, :n].astype(np.float64), 'full')
    lag = int(np.argmax(np.abs(c))) - (n - 1)
    return lag


lag_o = align(ours_pcm, sig)
lag_r = align(ref_pcm, sig)
print('lags', lag_o, lag_r)

H = 192
n = min(sig.shape[1], ours_pcm.shape[1] - lag_o, ref_pcm.shape[1] - lag_r)
src = sig[:, :n].astype(np.float64)
eo = ours_pcm[:2, lag_o:lag_o + n].astype(np.float64) - src
er = ref_pcm[:2, lag_r:lag_r + n].astype(np.float64) - src
nh = n // H


def prof(x):
    return 10 * np.log10(np.maximum(
        (x[:, :nh * H] ** 2).reshape(2, nh, H).mean((0, 2)), 1e-12))


po, pr, ps = prof(eo), prof(er), prof(src)
d = po - pr
worst = np.argsort(d)[::-1][:12]
print('worst hops (hop, t_s, au, src_dB, ours_err, ref_err, delta):')
for h in sorted(worst):
    au = h * H // 960
    print(f'  {h:4d} t={h*H/48000:6.3f} au={au:3d} src={ps[h]:7.1f} '
          f'ours={po[h]:7.1f} ref={pr[h]:7.1f} d={d[h]:+6.1f}')

seen = set()
for h in sorted(worst):
    au0 = h * H // 960
    for au in range(max(au0 - 1, 0), min(au0 + 2, len(ours_aus), len(ref_aus))):
        if au in seen:
            continue
        seen.add(au)
        try:
            o = aacparse.parse_au(ours_aus[au])[0]
            r = aacparse.parse_au(ref_aus[au])[0]
        except Exception as e:
            print(f'au {au}: parse fail {e}')
            continue

        def fmt(p, nbytes):
            i = p['info']
            ch = p['channels']
            tns = [c['tns'] is not None for c in ch]
            gg = [c['global_gain'] for c in ch]
            ms = sum(sum(g) for g in p['ms_used']) if p.get('ms_used') else 0
            return (f"ws={i['window_sequence']} bytes={nbytes} gg={gg} "
                    f"tns={tns} ms={ms}")
        print(f'au {au:3d}: OURS {fmt(o, len(ours_aus[au]))}')
        print(f'        REF  {fmt(r, len(ref_aus[au]))}')
np.save('.scratch/diag_prof.npy', np.stack([ps, po, pr]))
print('done', flush=True)
