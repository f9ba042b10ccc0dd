#!/usr/bin/env python3
"""Profile the DAB+ device-pack path per bench config: device step time,
device->host transfer, host emit - the round-3 cost map (ROADMAP.md perf).

Usage: python tools/prof_dab.py [lc|sbr|ps ...]   (default: all three)
Env: BENCH_STREAMS (default 2048), PROF_ITERS (default 10).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".scratch", "jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    S = int(os.environ.get("BENCH_STREAMS", "2048"))
    iters = int(os.environ.get("PROF_ITERS", "10"))
    rng = np.random.default_rng(0)
    which = sys.argv[1:] or ["lc", "sbr", "ps"]

    configs = {"lc": (12, 2), "sbr": (6, 1), "ps": (4, 2)}
    for aot in which:
        subch, ch = configs[aot]
        cfg = DabPlusConfig(48000, subch, ch, aot=aot)
        enc = DabPlusEncoder(cfg, n_streams=S, pack_on_device=True)
        pcm = jnp.asarray(rng.integers(-16000, 16000, (S, ch, 5760)),
                          jnp.int16)
        st = enc.init_state()
        t0 = time.perf_counter()
        st, out = enc.encode_superframes(st, pcm, pack=False)
        jax.block_until_ready(out)
        dt_compile = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(iters):
            st, out = enc.encode_superframes(st, pcm, pack=False)
        jax.block_until_ready(out)
        dt_dev = (time.perf_counter() - t0) / iters

        t0 = time.perf_counter()
        out_np = {k: np.asarray(v) for k, v in out.items()}
        dt_tx = time.perf_counter() - t0
        nbytes = sum(v.nbytes for v in out_np.values())

        t0 = time.perf_counter()
        for _ in range(3):
            frames = enc.pack_superframes(out)
        dt_emit = (time.perf_counter() - t0) / 3 - dt_tx

        audio_s = S * 5760 / 48000.0
        rate_dev = audio_s / dt_dev
        rate_full = audio_s / max(dt_dev, dt_tx + max(dt_emit, 0.0))
        print(f"{aot}: compile {dt_compile:.1f}s | device {dt_dev*1e3:.1f} ms"
              f" | transfer {dt_tx*1e3:.1f} ms ({nbytes/1e6:.2f} MB)"
              f" | emit {max(dt_emit,0)*1e3:.1f} ms"
              f" | device-only {rate_dev:.0f} streams*rt"
              f" | pipelined full {rate_full:.0f} streams*rt")


if __name__ == "__main__":
    main()
