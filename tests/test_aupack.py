"""Device DAB+ AU/superframe emission (dabplus/aupack.py).

Byte equality is asserted at the packer level: the same encoder outputs go
through the host writer and the device slot packer (two differently-fused
jit graphs of the full encoder may legitimately make different quantizer
decisions at float decision boundaries, so end-to-end equality between
encoder instances is NOT the contract - identical emission for identical
decisions is).  A separate end-to-end test checks the in-scan device path
produces structurally valid superframes (RS, firecode, AU CRCs, decode)."""
import numpy as np
import pytest

from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig
from odr_audioenc_tpu.dabplus import aupack


def _signal(rng, S, ch, n, kind):
    if kind == "noise":
        return rng.integers(-16000, 16000, (S, ch, n)).astype(np.int16)
    if kind == "quiet":
        return rng.integers(-60, 60, (S, ch, n)).astype(np.int16)
    if kind == "attack":
        x = rng.integers(-200, 200, (S, ch, n)).astype(np.int16)
        t = np.arange(300)
        burst = (14000 * np.sin(2 * np.pi * 3000 / 48000 * t)).astype(np.int16)
        x[:, :, n // 2:n // 2 + 300] += burst
        return x
    t = np.arange(n) / 48000.0
    x = (11000 * np.sin(2 * np.pi * 997 * t)).astype(np.int16)
    return np.tile(x, (S, ch, 1)).astype(np.int16)


CASES = [
    dict(rate=48000, subch=12, ch=2),
    dict(rate=48000, subch=8, ch=1),
    dict(rate=32000, subch=6, ch=2),
    dict(rate=48000, subch=24, ch=2),
    dict(rate=48000, subch=6, ch=1, aot="sbr"),
    dict(rate=48000, subch=8, ch=2, aot="sbr"),
    dict(rate=48000, subch=4, ch=2, aot="ps"),
    dict(rate=32000, subch=4, ch=2, aot="ps"),
]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("with_pad", [False, True])
def test_device_pack_matches_host(case, with_pad):
    if with_pad and case["subch"] != 12:
        pytest.skip("pad path covered once")
    S = 3
    cfg = DabPlusConfig(case["rate"], case["subch"], case["ch"],
                        aot=case.get("aot", "lc"),
                        pad_len=16 if with_pad else 0)
    enc = DabPlusEncoder(cfg, n_streams=S)
    rng = np.random.default_rng(5)
    st = enc.init_state()
    n = cfg.num_aus * cfg.au_samples
    for kind in ["noise", "attack", "quiet", "tone"]:
        pcm = _signal(rng, S, cfg.channels, n, kind)
        pads = None
        if with_pad:
            pads = [[bytes(rng.integers(0, 256, int(rng.integers(0, 17)))
                           .astype(np.uint8)) for _ in range(cfg.num_aus)]
                    for _ in range(S)]
        st, out = enc.encode_superframes(st, pcm, pack=False, pads=pads)
        out = {k: np.asarray(v) for k, v in out.items()}
        fr_h = enc.pack_superframes(out, add_rs=True, pads=pads,
                                    use_native=False)
        fr_d = aupack.pack_from_outputs(enc, out, pads=pads, add_rs=True)
        for s in range(S):
            h, d = fr_h[s], fr_d[s].tobytes()
            assert h == d, (
                f"{case} pad={with_pad} {kind} stream {s}: first diff at "
                f"{next(j for j in range(min(len(h), len(d))) if h[j] != d[j])}"
                f" of {len(h)}/{len(d)}")


def test_device_mode_end_to_end_valid():
    """In-scan device packing yields RS/firecode/AU-CRC-valid superframes."""
    from odr_audioenc_tpu.fec.rs import superframe_check_rs
    from odr_audioenc_tpu.host.aacpack import firecode_crc, crc16_ccitt
    cfg = DabPlusConfig(48000, 12, 2, aot="lc")
    S = 2
    enc = DabPlusEncoder(cfg, n_streams=S, pack_on_device=True)
    rng = np.random.default_rng(7)
    st = enc.init_state()
    n = cfg.num_aus * cfg.au_samples
    for kind in ["noise", "attack"]:
        pcm = _signal(rng, S, 2, n, kind)
        st, frames = enc.encode_superframes(st, pcm)
        for s in range(S):
            sf = np.frombuffer(frames[s], np.uint8)
            assert len(sf) == 12 * 120
            assert superframe_check_rs(sf)
            core = bytes(sf[:12 * 110])
            assert firecode_crc(core[2:11]) == (core[0] << 8) | core[1]
            # AU starts + per-AU CRC
            bits = ''.join(f'{b:08b}' for b in core[:11])
            starts = [11] + [int(bits[24 + 12 * i:36 + 12 * i], 2)
                             for i in range(5)]
            ends = starts[1:] + [12 * 110]
            for lo, hi in zip(starts, ends):
                au, crc = core[lo:hi - 2], core[hi - 2:hi]
                assert crc16_ccitt(au) ^ 0xFFFF == (crc[0] << 8) | crc[1]
    # a SECOND device-pack encoder must trace cleanly (regression: cached
    # jnp constants leaking tracers across jit traces)
    cfg2 = DabPlusConfig(48000, 6, 1, aot="sbr")
    enc2 = DabPlusEncoder(cfg2, n_streams=1, pack_on_device=True)
    pcm2 = _signal(rng, 1, 1, cfg2.num_aus * cfg2.au_samples, "noise")
    _, fr2 = enc2.encode_superframes(enc2.init_state(), pcm2)
    assert superframe_check_rs(np.frombuffer(fr2[0], np.uint8))


@pytest.mark.slow
def test_pack_bound_covers_recovery_bound_all_configs():
    """The model.pack_superframes overflow warning must be unreachable:
    AuPackCtx construction statically asserts that the rate loop's crash-
    recovery bit bound (budget_au + bitres_max + X-PAD DSE + align) fits the
    device content-buffer bound (aupack.py AuPackCtx).  Sweep every
    CLI-reachable DAB+ config; construction raises if any violates it."""
    for rate in (48000, 32000):
        for subch in range(1, 25):
            for ch in (1, 2):
                for aot in ("lc", "sbr", "ps"):
                    if aot == "ps" and ch != 2:
                        continue
                    for pad_len in (0, 58):
                        cfg = DabPlusConfig(rate, subch, ch, aot=aot,
                                            pad_len=pad_len)
                        DabPlusEncoder(cfg, n_streams=1, pack_on_device=True)
