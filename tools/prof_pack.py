#!/usr/bin/env python3
"""Round-3 profiling: scatter-pack microbench + DAB+ full-path cost split.

Questions this answers (on the real TPU):
  1. What does a binpack-style batched scatter-add cost at MP2 scale
     (K~7k updates/stream) and at DAB+ AU scale (K~100k updates/stream)?
  2. Where does the lc_96 superframe step spend its 5.9 s: device compute,
     device->host transfer (which arrays), or host pack?
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".scratch", "jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

S = int(os.environ.get("PROF_S", "2048"))


def timeit(fn, n=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def scatter_bench():
    rng = np.random.default_rng(0)
    for K, n_bytes in [(7000, 388), (28000, 1440), (100000, 1440)]:
        idx = jnp.asarray(rng.integers(0, n_bytes, (S, K)), jnp.int32)
        contrib = jnp.asarray(rng.integers(0, 255, (S, K)), jnp.int32)

        @jax.jit
        def pack(idx, contrib):
            out = jnp.zeros((S, n_bytes), jnp.int32)
            return out.at[jnp.arange(S)[:, None], idx].add(contrib)

        dt = timeit(lambda: pack(idx, contrib))
        print(f"scatter S={S} K={K} bytes={n_bytes}: {dt*1e3:.2f} ms")

    # the same via one-dim flattened scatter (row-major indices)
    K, n_bytes = 28000, 1440
    idx = jnp.asarray(rng.integers(0, n_bytes, (S, K)), jnp.int32)
    contrib = jnp.asarray(rng.integers(0, 255, (S, K)), jnp.int32)

    @jax.jit
    def packf(idx, contrib):
        flat = (jnp.arange(S, dtype=jnp.int32)[:, None] * n_bytes + idx).reshape(-1)
        out = jnp.zeros((S * n_bytes,), jnp.int32)
        return out.at[flat].add(contrib.reshape(-1)).reshape(S, n_bytes)

    dt = timeit(lambda: packf(idx, contrib))
    print(f"scatter-flat S={S} K={K}: {dt*1e3:.2f} ms")

    # gather-formulation: per output byte, sum T=8 neighbour slots
    for K, T in [(28000, 8), (28000, 16)]:
        ends = jnp.asarray(np.sort(rng.integers(0, n_bytes * 8, (S, K)), axis=1),
                           jnp.int32)
        vals = jnp.asarray(rng.integers(0, 1 << 20, (S, K)), jnp.int32)

        @jax.jit
        def packg(ends, vals):
            pos = jnp.arange(n_bytes, dtype=jnp.int32) * 8  # [n_bytes]
            k0 = jnp.searchsorted(ends[0], pos)  # placeholder shape probe
            # per-stream searchsorted via vmap
            kk = jax.vmap(lambda e: jnp.searchsorted(e, pos, side="right"))(ends)
            acc = jnp.zeros((S, n_bytes), jnp.int32)
            for t in range(T):
                k = jnp.clip(kk + t, 0, K - 1)
                v = jnp.take_along_axis(vals, k, axis=1)
                e = jnp.take_along_axis(ends, k, axis=1)
                sh = e - (pos[None, :] + 8)
                c = jnp.where(sh >= 0, (v >> jnp.minimum(sh, 31)) & 0xFF,
                              (v << jnp.minimum(-sh, 8)) & 0xFF)
                acc = acc + c
            return acc

        dt = timeit(lambda: packg(ends, vals))
        print(f"gatherpack S={S} K={K} T={T}: {dt*1e3:.2f} ms")


def dab_split():
    from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig
    rng = np.random.default_rng(0)
    for name, kw, ch, subch in (("lc_96", dict(aot="lc"), 2, 12),
                                ("sbr_48", dict(aot="sbr"), 1, 6),
                                ("ps_32", dict(aot="ps"), 2, 4)):
        dcfg = DabPlusConfig(48000, subch, ch, **kw)
        denc = DabPlusEncoder(dcfg, n_streams=S)
        pcm = jnp.asarray(rng.integers(-16000, 16000, (S, ch, 5760)), jnp.int16)
        st = denc.init_state()
        # device compute only
        st, out = denc.encode_superframes(st, pcm, pack=False)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        st, out = denc.encode_superframes(st, pcm, pack=False)
        jax.block_until_ready(out)
        t_dev = time.perf_counter() - t0
        # transfer
        t0 = time.perf_counter()
        out_np = {k: np.asarray(v) for k, v in out.items()}
        t_xfer = time.perf_counter() - t0
        nbytes = sum(v.nbytes for v in out_np.values())
        # host pack
        t0 = time.perf_counter()
        denc.pack_superframes(out, add_rs=True)
        t_pack = time.perf_counter() - t0
        sizes = {k: v.nbytes // 1024 for k, v in
                 sorted(out_np.items(), key=lambda kv: -kv[1].nbytes)[:6]}
        print(f"{name}: dev={t_dev*1e3:.0f}ms xfer={t_xfer*1e3:.0f}ms "
              f"({nbytes/1e6:.1f}MB) pack={t_pack*1e3:.0f}ms  top={sizes}")


def mp2_split():
    from odr_audioenc_tpu.mp2.model import Mp2Encoder, make_config
    from odr_audioenc_tpu.host.mp2pack import Mp2Packer
    rng = np.random.default_rng(0)
    cfg = make_config([{"rate": 48000, "bitrate": 128, "mode": "j"}] * S)
    for pod in (False, True):
        enc = Mp2Encoder(cfg, psy_model=1, dtype=jnp.float32, pack_on_device=pod)
        packer = Mp2Packer(cfg)
        pcm = jnp.asarray(rng.integers(-16000, 16000, (S, 2, 1152)), jnp.int16)
        xpad = jnp.zeros((S,), jnp.int32)
        step = jax.jit(enc._encode_step)
        st = enc.init_state()
        st, out = step(st, pcm, xpad)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        st, out = step(st, pcm, xpad)
        jax.block_until_ready(out)
        t_dev = time.perf_counter() - t0
        t0 = time.perf_counter()
        out_np = {k: np.asarray(v) for k, v in out.items()}
        t_xfer = time.perf_counter() - t0
        nbytes = sum(v.nbytes for v in out_np.values())
        t0 = time.perf_counter()
        packer.emit(out_np)
        t_pack = time.perf_counter() - t0
        print(f"mp2 pack_on_device={pod}: dev={t_dev*1e3:.0f}ms "
              f"xfer={t_xfer*1e3:.0f}ms ({nbytes/1e6:.2f}MB) pack={t_pack*1e3:.0f}ms")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"platform={jax.devices()[0].platform} S={S}")
    if which in ("all", "scatter"):
        scatter_bench()
    if which in ("all", "mp2"):
        mp2_split()
    if which in ("all", "dab"):
        dab_split()
