"""f32 fast-psy TPU path: must produce valid MP2 frames with decisions close
to the bit-exact f64 path (the fast path replaces the reference's 0.1dB-
quantised add_db accumulation with exact linear-domain sums)."""
import numpy as np
import jax.numpy as jnp

from odr_audioenc_tpu.mp2.model import Mp2Encoder, make_config
from odr_audioenc_tpu.host.mp2pack import Mp2Packer
from odr_audioenc_tpu.host import mp2parse

from signals import music_like, frames_of


def test_fast_psy_close_and_valid():
    nf = 12
    frames = frames_of(music_like(nf))
    cfgd = [{"rate": 48000, "bitrate": 128, "mode": "j"}]
    cfg = make_config(cfgd)

    enc64 = Mp2Encoder(cfg, psy_model=1, dtype=jnp.float64)
    enc32 = Mp2Encoder(cfg, psy_model=1, dtype=jnp.float32, fast_psy=True)
    packer = Mp2Packer(cfg)
    s64, s32 = enc64.init_state(), enc32.init_state()

    smr_diffs = []
    ba_same = 0
    stream = b""
    for fi in range(nf):
        s64, o64 = enc64.encode_step(s64, frames[fi][None])
        s32, o32 = enc32.encode_step(s32, frames[fi][None])
        smr_diffs.append(np.abs(np.asarray(o64["smr"]) - np.asarray(o32["smr"])).max())
        if np.array_equal(np.asarray(o64["bit_alloc"]), np.asarray(o32["bit_alloc"])):
            ba_same += 1
        out_np = {k: np.asarray(v) for k, v in o32.items()}
        for chunk in packer.emit(out_np):
            stream += chunk
    for chunk in packer.finish():
        stream += chunk

    # SMR divergence should be within ~the add_db table quantisation regime
    assert max(smr_diffs) < 3.0, f"fast-psy SMR diverged by {max(smr_diffs)} dB"
    # most frames should allocate identically
    assert ba_same >= nf * 0.5, f"only {ba_same}/{nf} frames allocate identically"

    # every produced frame must be structurally valid with a correct CRC
    parsed = [mp2parse.parse_frame(f) for f in mp2parse.split_frames(stream)]
    assert len(parsed) == nf
    assert all(p["crc_ok"] for p in parsed)


def test_tonal_pallas_matches_jnp():
    """The fused Pallas tonal kernel (interpret mode on CPU) reproduces the
    jnp relaxation exactly: same member/type masks, power within f32 noise."""
    import jax.numpy as jnp
    import numpy as np
    from odr_audioenc_tpu.mp2 import psycho1, psycho1_fast, psycho1_pallas

    rng = np.random.default_rng(7)
    B = 64
    power = jnp.asarray(rng.uniform(-90, 40, (B, 512)).astype(np.float32))
    prev = power[:, 1:-1] > power[:, :-2]
    nxt = power[:, 1:-1] >= power[:, 2:]
    cand = jnp.zeros_like(power, dtype=bool).at[:, 1:-1].set(prev & nxt)
    cand = cand & ((jnp.arange(512) >= 2) & (jnp.arange(512) < 512 - psycho1.PAD))

    pw_j, mem_j, typ_j = psycho1_fast.tonal_fast(power, cand, jnp.float32)
    pw_p, mem_p, typ_p = psycho1_pallas.tonal_pallas(
        power, cand, jnp.float32, interpret=True)
    assert bool((mem_j == mem_p).all())
    assert bool((typ_j == typ_p).all())
    assert float(jnp.abs(pw_j - pw_p).max()) < 1e-3


def test_tonal_noise_pallas_matches_jnp():
    """The fused tonal+noise kernel (interpret mode) matches the jnp
    tonal_fast + noise_fast pipeline."""
    import jax.numpy as jnp
    import numpy as np
    from odr_audioenc_tpu.mp2.model import Mp2Encoder, make_config
    from odr_audioenc_tpu.mp2 import psycho1, psycho1_fast, psycho1_pallas

    S = 16
    cfg = make_config([{"rate": 48000, "bitrate": 128, "mode": "j"}] * S)
    enc = Mp2Encoder(cfg, psy_model=1, dtype=jnp.float32)
    tabs = enc.psy1_tabs
    nu = tabs["static_noise_uniform"]
    assert nu is not None

    rng = np.random.default_rng(3)
    win = jnp.asarray(rng.standard_normal((S * 2, 1024)), jnp.float32) * 0.1
    power, energy, spike = psycho1.power_spectrum(win, jnp.float32)
    prev = power[:, 1:-1] > power[:, :-2]
    nxt = power[:, 1:-1] >= power[:, 2:]
    cand = jnp.zeros_like(power, dtype=bool).at[:, 1:-1].set(prev & nxt)
    cand = cand & ((jnp.arange(512) >= 2) & (jnp.arange(512) < 512 - psycho1.PAD))

    pw_j, tm_j, typ_j = psycho1_fast.tonal_fast(power, cand, jnp.float32)
    pw_j, nm_j = psycho1_fast.noise_fast(pw_j, typ_j, energy,
                                         tabs["band_matrix"],
                                         tabs["centre_base"],
                                         tabs["centre_span"], jnp.float32)
    bmt, base32, span32 = nu
    pw_p, tm_p, nm_p = psycho1_pallas.tonal_noise_pallas(
        power, cand, energy, jnp.asarray(bmt), jnp.asarray(base32),
        jnp.asarray(span32), interpret=True)
    assert bool((tm_j == tm_p).all())
    # centre = trunc(index*span) has zero rounding margin: f32 ulp
    # differences between the kernel and jnp paths can move a noise centre
    # by one bin on boundary cases - allow a handful of such flips
    mism = int((nm_j != nm_p).sum())
    assert mism <= 2 * S, f"noise member mismatch at {mism} bins"
    both = np.asarray(nm_j) & np.asarray(nm_p)
    d = np.abs(np.asarray(pw_j) - np.asarray(pw_p))[both]
    assert d.size == 0 or float(d.max()) < 1e-2, float(d.max())
