#!/usr/bin/env python3
"""Profile the MP2 device-frame path: device step vs transfer vs host emit."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from odr_audioenc_tpu.mp2.model import Mp2Encoder, make_config
    from odr_audioenc_tpu.host.mp2pack import Mp2Packer

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".scratch", "jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    S = int(os.environ.get("BENCH_STREAMS", "2048"))
    rng = np.random.default_rng(0)
    cfg = make_config([{"rate": 48000, "bitrate": 128, "mode": "j"}] * S)
    pcm = jnp.asarray(rng.integers(-16000, 16000, (S, 2, 1152)), jnp.int16)
    xpad = jnp.zeros((S,), jnp.int32)

    for mode in ["frame", True, False]:
        enc = Mp2Encoder(cfg, psy_model=1, dtype=jnp.float32,
                         pack_on_device=mode)
        packer = Mp2Packer(cfg)
        step = jax.jit(enc._encode_step, donate_argnums=(0,))
        st = enc.init_state()
        st, out = step(st, pcm, xpad)
        jax.block_until_ready(out)
        # device-only
        t0 = time.perf_counter()
        for _ in range(10):
            st, out = step(st, pcm, xpad)
        jax.block_until_ready(out)
        dt_dev = (time.perf_counter() - t0) / 10
        # transfer
        t0 = time.perf_counter()
        for _ in range(5):
            out_np = {k: np.asarray(v) for k, v in out.items()}
        dt_tx = (time.perf_counter() - t0) / 5
        nbytes = sum(v.nbytes for v in out_np.values())
        # host emit
        t0 = time.perf_counter()
        for _ in range(5):
            packer.emit(out_np)
        dt_emit = (time.perf_counter() - t0) / 5
        print(f"mode={mode}: dev={dt_dev*1e3:.1f}ms tx={dt_tx*1e3:.1f}ms "
              f"({nbytes/1e6:.2f}MB) emit={dt_emit*1e3:.1f}ms "
              f"-> full~{(max(dt_dev, dt_tx + dt_emit))*1e3:.1f}ms "
              f"({S*0.024/max(dt_dev, dt_tx+dt_emit):.0f} streams*x)")


if __name__ == "__main__":
    main()
