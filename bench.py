#!/usr/bin/env python3
"""Benchmark: concurrent streams x realtime factor per chip on the BASELINE
configs, FULL PATH - jitted device encode step + host transfer + native
bit-packing + Reed-Solomon, pipelined one step deep exactly like the fleet
runtime (fleet.py), so the number reflects bytes-on-the-wire throughput.

Configs (BASELINE.md):
  1. MP2 @128k stereo 48 kHz (DAB frames)
  2. AAC-LC @96k stereo (DAB+ superframes incl. RS)
  3. HE-AAC (SBR) @48k mono
  4. HE-AAC v2 (PS) @32k stereo
Headline = harmonic mean over the four configs (equal stream shares) vs the
north-star 1024 streams x 10x realtime (BASELINE.json).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np


def _prefetch(out):
    """Start device->host copies without blocking (jax copy_to_host_async):
    the transfer then overlaps the NEXT step's device compute and the
    previous step's host emit, so steady-state step time is
    max(device, transfer, emit) instead of device + transfer + emit."""
    vals = out.values() if hasattr(out, "values") else out
    for v in vals:
        f = getattr(v, "copy_to_host_async", None)
        if f is not None:
            try:
                f()
            except Exception:
                pass


def _full_path_throughput(dispatch, drain, audio_s, streams, iters):
    """One-step-deep pipeline: dispatch(k+1) overlaps drain(k)."""
    pend = dispatch()                 # warm (compile hit or cache)
    drain(pend)
    pend = dispatch()
    _prefetch(pend)
    t0 = time.perf_counter()
    for _ in range(iters):
        nxt = dispatch()              # async device dispatch
        _prefetch(nxt)                # async device->host copy
        drain(pend)                   # host pack + RS of the previous step
        pend = nxt
    dt = (time.perf_counter() - t0) / iters
    drain(pend)
    return streams * audio_s / dt


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".scratch", "jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # the remote-TPU tunnel occasionally drops; retry initialization a few
    # times before giving up so a transient outage doesn't void the bench
    # (jax caches a failed backend init, so clear it between attempts)
    for attempt in range(5):
        try:
            jax.devices()
            break
        except RuntimeError as e:
            if attempt == 4:
                raise
            print(f"backend init failed ({e}); retrying in 60s",
                  file=sys.stderr)
            try:
                from jax._src import xla_bridge as _xb
                _xb._clear_backends()
            except Exception:
                pass
            time.sleep(60)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from odr_audioenc_tpu.mp2.model import Mp2Encoder, make_config
    from odr_audioenc_tpu.host.mp2pack import Mp2Packer
    from odr_audioenc_tpu.dabplus.model import DabPlusEncoder, DabPlusConfig

    S = int(os.environ.get("BENCH_STREAMS", "2048"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    platform = jax.devices()[0].platform
    rng = np.random.default_rng(0)
    rates = {}

    # --- config 1: MP2 @128k stereo, full path (complete frames emitted on
    # device, host only patches the ScF-CRC back-bytes - mp2/framepack.py) ---
    cfg = make_config([{"rate": 48000, "bitrate": 128, "mode": "j"}] * S)
    enc = Mp2Encoder(cfg, psy_model=1, dtype=jnp.float32,
                     pack_on_device="frame")
    packer = Mp2Packer(cfg)
    pcm = jnp.asarray(rng.integers(-16000, 16000, (S, 2, 1152)), jnp.int16)
    xpad = jnp.zeros((S,), jnp.int32)
    step = jax.jit(enc._encode_step, donate_argnums=(0,))
    st = [enc.init_state()]

    def mp2_dispatch():
        st[0], out = step(st[0], pcm, xpad)
        return out

    def mp2_drain(out):
        out_np = {k: np.asarray(v) for k, v in out.items()}
        packer.emit(out_np)

    rates["mp2_128"] = _full_path_throughput(
        mp2_dispatch, mp2_drain, 1152 / 48000.0, S, iters)

    # --- configs 2-4: DAB+ full path (AU syntax + superframe + RS packed on
    # device, dabplus/aupack.py; host only slices rows) ---
    for name, kw, ch in (("lc_96", dict(aot="lc"), 2),
                         ("sbr_48", dict(aot="sbr"), 1),
                         ("ps_32", dict(aot="ps"), 2)):
        subch = {"lc_96": 12, "sbr_48": 6, "ps_32": 4}[name]
        dcfg = DabPlusConfig(48000, subch, ch, **kw)
        denc = DabPlusEncoder(dcfg, n_streams=S, pack_on_device=True)
        dpcm = jnp.asarray(rng.integers(-16000, 16000, (S, ch, 5760)), jnp.int16)
        dst = [denc.init_state()]

        def dab_dispatch(denc=denc, dst=dst, dpcm=dpcm):
            dst[0], out = denc.encode_superframes(dst[0], dpcm, pack=False)
            return out

        def dab_drain(out, denc=denc):
            denc.pack_superframes(out, add_rs=True)

        rates[name] = _full_path_throughput(
            dab_dispatch, dab_drain, 5760 / 48000.0, S, iters)

    # --- config 5: 64-station mixed fleet with per-stream bitrate mix,
    # audio-level stats publishing and file sinks (BASELINE.md config 5;
    # send path odr-audioenc.cpp:1282-1322 at fleet scale) ---
    rates["fleet_64"] = _fleet64_rate()

    mixed = len(rates) / sum(1.0 / r for r in rates.values())
    baseline = 1024 * 10
    detail = ", ".join(f"{k}={v:.0f}" for k, v in rates.items())
    print(json.dumps({
        "metric": f"concurrent 48kHz streams x realtime per chip, full path "
                  f"(device step + device pack/RS + host send), 5-config "
                  f"fleet ({platform}, S={S}; {detail})",
        "value": round(mixed, 1),
        "unit": "streams*x",
        "vs_baseline": round(mixed / baseline, 4),
    }))


def _fleet64_rate():
    """BASELINE config 5: 64 mixed stations (MP2 at 3 bitrates + DAB+ LC/
    SBR/PS) through the real fleet runtime - file sinks + stats sockets."""
    import tempfile
    import wave
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    import signals
    from odr_audioenc_tpu.fleet import run_fleet

    tmp = tempfile.mkdtemp(prefix="bench_fleet_")
    sig = signals.music_like(30)
    reps = -(-48000 * 30 // sig.shape[1])
    sig = np.tile(sig, (1, reps))[:, :48000 * 30]
    wav = os.path.join(tmp, "in.wav")
    wav1 = os.path.join(tmp, "in_mono.wav")
    for path, ch in ((wav, 2), (wav1, 1)):
        with wave.open(path, "wb") as w:
            w.setnchannels(ch)
            w.setsampwidth(2)
            w.setframerate(48000)
            w.writeframes(sig[:ch].T.astype("<i2").tobytes())
    streams = []
    for i in range(64):
        if i < 32:
            spec = {"codec": "mp2", "bitrate": [128, 192, 96, 160][i % 4],
                    "mode": "js"[i % 2]}
        elif i < 48:
            spec = {"codec": "dabplus", "bitrate": 96, "channels": 2}
        elif i < 56:
            spec = {"codec": "dabplus", "bitrate": 48, "channels": 1}
        else:
            spec = {"codec": "dabplus", "bitrate": 32, "channels": 2}
        spec.update(rate=48000,
                    input=wav1 if spec.get("channels") == 1 else wav,
                    output=os.path.join(tmp, f"out{i}.bin"),
                    stats=os.path.join(tmp, f"stats{i}.sock"))
        streams.append(spec)
    return run_fleet({"streams": streams})


if __name__ == "__main__":
    main()
