"""Per-stream crash recovery (FDKaacEnc_crashRecovery analogue,
qc_main.cpp:1149,1398): a stream whose AU cannot fit its budget is degraded
in isolation - bands zeroed from the top down, falling back to an all-zero
AU - while every other stream in the batch is bit-identical to a run
without the adversarial stream."""
import numpy as np
import jax.numpy as jnp

from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig
from odr_audioenc_tpu.dabplus import encode as E


def _encode(enc, spec, budgets):
    S = spec.shape[0]
    return E.encode_au(
        jnp.asarray(spec), enc.pt, enc.band_m, enc.bol,
        jnp.full((S,), enc.max_sfb, jnp.int32), jnp.asarray(budgets),
        jnp.full((S,), enc.core_channels, jnp.int32), jnp.float32,
        tns_cfg=enc.tns_cfg)


def test_adversarial_stream_recovers_others_unchanged():
    cfg = DabPlusConfig(48000, 12, 2)
    S = 8
    enc = DabPlusEncoder(cfg, n_streams=S)
    rng = np.random.default_rng(3)
    # hot wideband spectra: every band demands bits
    spec = rng.normal(0.0, 3e4, (S, 2, 960)).astype(np.float32)

    full = np.full((S,), enc.budget_au, np.int32)
    tiny = full.copy()
    tiny[7] = 128         # just above the stereo CPE floor (~117 bits:
    # elem_fixed incl. the ms mask + two all-zero ICS); recovery must fire

    out_a = _encode(enc, spec, tiny)
    out_b = _encode(enc, spec, full)

    bits_a = np.asarray(out_a["bits"])
    assert bits_a[7] <= 128, bits_a[7]
    # the degraded stream still emits a valid (possibly all-zero) AU
    assert (np.asarray(out_a["books"])[7] <= 15).all()
    # every OTHER stream's wire decisions are bit-identical
    for k in ("q", "gains", "books", "bits", "ms_used"):
        a, b = np.asarray(out_a[k]), np.asarray(out_b[k])
        assert (a[:7] == b[:7]).all(), k


def test_overfull_budget_never_overruns():
    """Every stream gets an unfittable budget: all must degrade, none may
    exceed it (the device pack bound depends on this invariant)."""
    cfg = DabPlusConfig(48000, 8, 1)
    S = 4
    enc = DabPlusEncoder(cfg, n_streams=S)
    rng = np.random.default_rng(9)
    spec = rng.normal(0.0, 5e4, (S, 1, 960)).astype(np.float32)
    budgets = np.full((S,), 56, np.int32)
    out = _encode(enc, spec, budgets)
    assert (np.asarray(out["bits"]) <= 56).all(), np.asarray(out["bits"])
    # no spectral data survives a 56-bit budget: every coded band carries
    # book 0 and its lines are zeroed (lines above sfb_off[max_sfb] are
    # never transmitted and may hold stale quantizer values)
    assert (np.asarray(out["books"]) == 0).all()
    lim = int(enc.sfb_off[enc.max_sfb])
    assert (np.asarray(out["q"])[..., :lim] == 0).all()
