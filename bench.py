#!/usr/bin/env python3
"""Benchmark: concurrent 48kHz stereo streams x realtime factor per chip.

Runs the f32 device encode step (MP2@128k joint stereo, psy model 1) on the
available accelerator and reports S * (audio seconds per step / wall seconds
per step).  Baseline reference point: the north-star target of 1024 streams at
10x realtime per chip (BASELINE.json) = 10240.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from odr_audioenc_tpu.mp2.model import Mp2Encoder, make_config

    S = int(os.environ.get("BENCH_STREAMS", "256"))
    platform = jax.devices()[0].platform
    cfg = make_config([{"rate": 48000, "bitrate": 128, "mode": "j"}] * S)
    enc = Mp2Encoder(cfg, psy_model=1, dtype=jnp.float32)
    state = enc.init_state()
    rng = np.random.default_rng(0)
    pcm = jnp.asarray(rng.integers(-16000, 16000, (S, 2, 1152)), jnp.int16)
    xpad = jnp.zeros((S,), jnp.int32)

    step = jax.jit(enc._encode_step, donate_argnums=(0,))
    # warmup / compile
    state, out = step(state, pcm, xpad)
    jax.block_until_ready(out["sbband"])

    iters = int(os.environ.get("BENCH_ITERS", "20"))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = step(state, pcm, xpad)
    jax.block_until_ready(out["sbband"])
    dt = (time.perf_counter() - t0) / iters

    audio_s = 1152.0 / 48000.0
    value = S * audio_s / dt
    baseline = 1024 * 10  # north-star: 1024 streams x 10x realtime per chip
    print(json.dumps({
        "metric": f"concurrent 48kHz stereo MP2@128k streams x realtime per chip ({platform}, S={S})",
        "value": round(value, 1),
        "unit": "streams*x",
        "vs_baseline": round(value / baseline, 4),
    }))


if __name__ == "__main__":
    main()
