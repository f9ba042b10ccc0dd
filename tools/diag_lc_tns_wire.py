"""Wire-level TNS comparison: parse BOTH encoders' bitstreams and compare
per-AU TNS configurations (n_filt, lengths, orders) around the transition
AUs that dominate the LC NMR gap.  Complements diag_lc_tns.py (which uses
internal taps) by comparing what actually hits the wire."""
import sys
sys.path.insert(0, 'tools')
sys.path.insert(0, 'tests')
sys.path.insert(0, '.')
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np
import signals
import fdk_ref
from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig
from odr_audioenc_tpu.host import dabplus_parse, aacparse


def tns_of(au_bytes):
    out = []
    for el in aacparse.parse_au(au_bytes):
        if el.get("id") == "END" or "channels" not in el:
            continue
        for ch in el["channels"]:
            t = ch.get("tns")
            if t is None:
                out.append(None)
            else:
                out.append([[(d["length"], d["order"], tuple(d["coefs"]))
                             for d in f] for f in t])
    return out


def main():
    per = 12 * 48000 // 3 // 1152 + 1
    sig = np.concatenate([signals.music_like(per), signals.speech_like(per),
                          signals.loud_tones(per)], axis=1)
    cfg = DabPlusConfig(48000, 12, 2, aot="lc")
    enc = DabPlusEncoder(cfg, 1)
    state = enc.init_state()
    spf = cfg.num_aus * cfg.au_samples
    ours = []
    for i in range(sig.shape[1] // spf):
        state, fr = enc.encode_superframes(
            state, sig[None, :, i * spf:(i + 1) * spf], add_rs=False)
        ours.extend(dabplus_parse.parse_superframe(fr[0])["aus"])
    fenc = fdk_ref.FdkEncoder(channels=2, sample_rate=48000,
                              subchannel_index=12,
                              aot=fdk_ref.AOT_DABPLUS_AAC_LC, afterburner=1)
    ref = []
    for sf in fenc.encode(sig):
        ref.extend(dabplus_parse.parse_superframe(sf)["aus"])

    AUS = [int(a) for a in sys.argv[1:]] or \
        [225, 226, 241, 242, 257, 258, 354, 355, 370, 371]
    # our wire runs one AU late vs ref (encoder lookahead); compare shifted
    SH = 1

    def fmt(t):
        if t is None:
            return "off"
        return "+".join("|".join(f"L{L}o{o}{list(c)}" for L, o, c in f)
                        for f in t if f) or "off"
    for au in AUS:
        r = tns_of(ref[au])
        u = tns_of(ours[au + SH]) if au + SH < len(ours) else []
        for c in range(2):
            print(f"au {au} ch{c}: ref {fmt(r[c] if c < len(r) else None):55s}"
                  f" ours[{au+SH}] {fmt(u[c] if c < len(u) else None)}")

    # corpus agreement
    n = min(len(ref), len(ours) - SH)
    both = on_r = on_u = 0
    for a in range(n):
        tr = tns_of(ref[a])
        tu = tns_of(ours[a + SH])
        r_on = any(t is not None for t in tr)
        u_on = any(t is not None for t in tu)
        on_r += r_on
        on_u += u_on
        both += r_on and u_on
    print(f"\ncorpus: ref on {on_r}/{n}, ours on {on_u}/{n}, both {both}")


if __name__ == "__main__":
    main()
