#!/usr/bin/env python3
"""Ablation cost map for the LC superframe step (device time at S=2048).

Measures the full jitted step, then variants with stages disabled, so the
difference attributes device time per stage without needing a profiler
through the axon tunnel (per-op microbenches are RPC-latency-dominated).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(name, n_bisect=None, afterburner=True, refine=None, pack=True,
        S=None):
    import jax
    import jax.numpy as jnp
    from odr_audioenc_tpu.dabplus import encode as E
    from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".scratch", "jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    S = S or int(os.environ.get("BENCH_STREAMS", "2048"))
    rng = np.random.default_rng(0)
    old_refine = E.REFINE_ROUNDS
    old_bisect = getattr(E, "BISECT_STEPS", None)
    if refine is not None:
        E.REFINE_ROUNDS = refine
    if n_bisect is not None:
        E.BISECT_STEPS = n_bisect
    try:
        cfg = DabPlusConfig(48000, 12, 2, aot="lc", afterburner=afterburner)
        enc = DabPlusEncoder(cfg, n_streams=S, pack_on_device=pack)
        pcm = jnp.asarray(rng.integers(-16000, 16000, (S, 2, 5760)),
                          jnp.int16)
        st = enc.init_state()
        st, out = enc.encode_superframes(st, pcm, pack=False)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            st, out = enc.encode_superframes(st, pcm, pack=False)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"{name}: {dt*1e3:.1f} ms", flush=True)
        return dt
    finally:
        E.REFINE_ROUNDS = old_refine
        E.BISECT_STEPS = old_bisect


def main():
    import jax.numpy as jnp
    from odr_audioenc_tpu.dabplus import aupack

    run("full (bisect7 + dp + refine2 + pack)")
    run("no refine (afterburner off)", afterburner=False)
    run("bisect 1 step", n_bisect=1)
    run("no device pack", pack=False)

    # split the pack cost: AU content pack vs superframe assemble+RS
    orig_asm = aupack.assemble_superframes

    def fake_asm(ctx, aubuf, au_bits, crc_part, add_rs=True):
        S = aubuf.shape[0]
        return (aubuf.reshape(S, -1)[:, :ctx.total].astype(jnp.uint8),
                jnp.zeros((S, aubuf.shape[1]), jnp.int32))
    aupack.assemble_superframes = fake_asm
    try:
        run("pack AUs, no assemble/RS")
    finally:
        aupack.assemble_superframes = orig_asm

    orig_pack = aupack.pack_au_content
    orig_groups = aupack.au_content_groups

    def fake_groups(ctx, o, is_last, pad_buf=None, pad_len=None,
                    sbr_group=None):
        return []

    S0 = int(os.environ.get("BENCH_STREAMS", "2048"))

    def fake_pack(ctx, groups):
        return (jnp.zeros((S0, ctx.maxcb), jnp.int32),
                jnp.full((S0,), 64, jnp.int32),
                jnp.zeros((S0,), jnp.int32))
    aupack.au_content_groups = fake_groups
    aupack.pack_au_content = fake_pack
    try:
        run("assemble/RS only, no AU pack")
    finally:
        aupack.pack_au_content = orig_pack
        aupack.au_content_groups = orig_groups


if __name__ == "__main__":
    main()
