#!/usr/bin/env python3
"""Microbenchmark the LC rate-loop bit-count kernel on the TPU.

The superframe step runs ~60 bit-count evaluations (6 AUs x (7 bisect +
1 final + 2 refine)); this times one evaluation's pieces standalone at the
bench shape [2048, 2, 960] to locate the device cost (ROADMAP round-3
cost-map task).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from odr_audioenc_tpu.dabplus import encode as E
    from odr_audioenc_tpu.dabplus import tables as AT

    S = int(os.environ.get("BENCH_STREAMS", "2048"))
    rng = np.random.default_rng(0)

    rate = 48000
    off = AT.sfb_offsets(rate)
    NB = AT.MAX_SFB_LONG
    nb = len(off) - 1
    bol_np = np.zeros(960, np.int32)
    band_m_np = np.zeros((NB, 960), np.float32)
    for b in range(nb):
        bol_np[off[b]:off[b + 1]] = b
        band_m_np[b, off[b]:off[b + 1]] = 1.0
    band_m = jnp.asarray(band_m_np)
    bol = jnp.asarray(bol_np)
    bctx = E.BandCtx(band_m, bol)

    q = jnp.asarray(rng.integers(-40, 40, (S, 2, 960)), jnp.int32)
    bandsel = jnp.ones((S, 2, NB), bool)

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"{name}: {dt*1e3:.2f} ms")
        return dt

    timeit("spectral_bits_and_books (argmin)",
           lambda q: E.spectral_bits_and_books(q, bctx, bandsel, jnp.float32),
           q)

    def with_dp(q):
        cost, _ = E.spectral_bits_and_books(q, bctx, bandsel, jnp.float32,
                                            return_cost=True)
        books = E.optimal_books(cost, bandsel)
        return books

    timeit("spectral costs + sectioning DP", with_dp, q)

    gains = jnp.asarray(rng.integers(100, 156, (S, 2, NB)), jnp.int32)
    books = jnp.asarray(rng.integers(0, 12, (S, 2, NB)), jnp.int32)
    timeit("side_info_bits",
           lambda b, g: E.side_info_bits(b, g, bandsel, jnp.float32), books,
           gains)

    mag075 = jnp.asarray(rng.random((S, 2, 960)), jnp.float32) * 100.0

    def quantize(g):
        scale = bctx.to_lines(jnp.exp2(-0.1875 * g.astype(jnp.float32)))
        qq = jnp.clip(jnp.floor(mag075 * scale + 0.4054).astype(jnp.int32),
                      0, 8191)
        return qq

    timeit("quantize", quantize, gains)


if __name__ == "__main__":
    main()
