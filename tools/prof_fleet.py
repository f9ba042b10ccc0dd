"""Fleet phase profiler: where does the 64-station mixed-fleet wall time go?

Runs the bench fleet_64 config with timers wrapped around the host-side
phases (input reads, pack/emit, send, stats publish) and the device sync
point (the np.asarray drain of the pending step).  Device dispatch/compute
is NOT directly timed: it overlaps the host phases by design (one-step
pipeline), so the report prints wall, the timed host phases, and
"untimed" = wall - sum(timed), which at steady state is the true device
bottleneck share (dispatch + blocked-on-device time).
"""
import os
import sys
import time
import tempfile
import wave
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))


def build_conf(seconds=30):
    import signals
    tmp = tempfile.mkdtemp(prefix="prof_fleet_")
    sig = signals.music_like(seconds)
    reps = -(-48000 * seconds // sig.shape[1])
    sig = np.tile(sig, (1, reps))[:, :48000 * seconds]
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
    return {"streams": streams}


def main():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".scratch", "jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from odr_audioenc_tpu import fleet
    from odr_audioenc_tpu.host.mp2pack import Mp2Packer
    from odr_audioenc_tpu.dabplus.model import DabPlusEncoder

    times = defaultdict(float)
    counts = defaultdict(int)

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            r = fn(*a, **k)
            times[name] += time.perf_counter() - t0
            counts[name] += 1
            return r
        return wrap

    Mp2Packer.emit = timed("mp2_emit", Mp2Packer.emit)
    DabPlusEncoder.pack_superframes = timed(
        "dab_pack", DabPlusEncoder.pack_superframes)
    fleet._Station.read_frame = timed("read", fleet._Station.read_frame)
    fleet._Station.send = timed("send", fleet._Station.send)
    fleet._Station.publish = timed("publish", fleet._Station.publish)
    # the device sync point: drain's first np.asarray of a pending output
    # blocks until that step's device work AND d2h copy complete
    orig_asarray = np.asarray

    def timed_asarray(x, *a, **k):
        if hasattr(x, "copy_to_host_async"):      # jax array: sync point
            t0 = time.perf_counter()
            r = orig_asarray(x, *a, **k)
            times["dev_sync"] += time.perf_counter() - t0
            counts["dev_sync"] += 1
            return r
        return orig_asarray(x, *a, **k)
    np.asarray = timed_asarray

    conf = build_conf(30)
    t0 = time.perf_counter()
    rate = fleet.run_fleet(conf)
    wall = time.perf_counter() - t0
    np.asarray = orig_asarray
    print(f"rate {rate:.1f} streams*rt, wall {wall:.2f}s (incl. compile)")
    timed_sum = sum(times.values())
    for k in sorted(times, key=lambda k: -times[k]):
        print(f"  {k:10s} {times[k]:7.2f}s  n={counts[k]}")
    print(f"  {'untimed':10s} {wall - timed_sum:7.2f}s  "
          f"(device dispatch + python loop + compile)")


if __name__ == "__main__":
    main()
