"""CLI + fleet end-to-end tests (file in / file out)."""
import json
import socket
import numpy as np
import pytest

from odr_audioenc_tpu.cli import main as cli_main
from odr_audioenc_tpu.io.wav import WavWriter, WavReader
from odr_audioenc_tpu.fec.rs import superframe_check_rs

from signals import music_like

import gen_golden

GOLDEN = gen_golden.GOLDEN


def write_wav(path, sig, rate=48000):
    w = WavWriter(str(path), rate, sig.shape[0])
    inter = np.empty(sig.shape[1] * sig.shape[0], np.int16)
    for c in range(sig.shape[0]):
        inter[c::sig.shape[0]] = sig[c]
    w.write(inter.tobytes())
    w.close()


def test_cli_mp2_matches_golden(tmp_path):
    sig = music_like(40)
    wav = tmp_path / "in.wav"
    write_wav(wav, sig)
    out = tmp_path / "out.mp2"
    rc = cli_main(["-a", "-i", str(wav), "-b", "128", "-c", "2", "-r", "48000",
                   "--dabmode", "j", "-o", str(out)])
    assert rc == 0
    got = out.read_bytes()
    want = (GOLDEN / "music_48s_128_j_psy1.mp2").read_bytes()
    # the golden stream may be longer (flush chunking); compare the overlap
    n = min(len(got), len(want))
    assert n > 0 and got[:n] == want[:n]


def test_cli_dabplus_valid(tmp_path):
    sig = music_like(15)
    wav = tmp_path / "in.wav"
    write_wav(wav, sig)
    out = tmp_path / "out.dabp"
    rc = cli_main(["-i", str(wav), "-b", "96", "-c", "2", "-r", "48000",
                   "-o", str(out)])
    assert rc == 0
    data = out.read_bytes()
    sflen = 120 * 12
    assert len(data) % sflen == 0 and len(data) > 0
    for i in range(len(data) // sflen):
        assert superframe_check_rs(np.frombuffer(data[i * sflen:(i + 1) * sflen],
                                                 np.uint8))


def test_cli_silence_exit_code(tmp_path):
    sig = np.zeros((2, 1152 * 100), np.int16)
    wav = tmp_path / "in.wav"
    write_wav(wav, sig)
    rc = cli_main(["-a", "-i", str(wav), "-b", "128", "-o", str(tmp_path / "o.mp2"),
                   "-s", "1"])
    assert rc == 2


def test_fleet_mixed(tmp_path):
    sigs = {}
    streams = []
    stats_rx = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
    stats_path = str(tmp_path / "stats.sock")
    stats_rx.bind(stats_path)
    stats_rx.settimeout(1.0)
    for i, spec in enumerate([
        {"codec": "mp2", "bitrate": 128, "mode": "j"},
        {"codec": "mp2", "bitrate": 192, "mode": "s"},
        {"codec": "mp2", "bitrate": 96, "mode": "m", "channels": 1},
        {"codec": "dabplus", "bitrate": 96, "channels": 2},
        {"codec": "dabplus", "bitrate": 96, "channels": 2},
    ]):
        ch = spec.get("channels", 1 if spec.get("mode") == "m" else 2)
        sig = music_like(15, stereo=(ch == 2), seed=100 + i)
        if ch == 1:
            sig = sig[:1]
        wav = tmp_path / f"in{i}.wav"
        write_wav(wav, sig)
        out = tmp_path / f"out{i}.bin"
        streams.append({**spec, "rate": 48000, "input": str(wav),
                        "output": str(out),
                        **({"stats": stats_path} if i == 0 else {})})
    conf_path = tmp_path / "fleet.json"
    conf_path.write_text(json.dumps({"streams": streams}))
    rc = cli_main(["--streams", str(conf_path), "-o", "ignored"])
    assert rc == 0
    for i in range(5):
        assert (tmp_path / f"out{i}.bin").stat().st_size > 0
    # stats datagrams arrived as JSON
    msg = json.loads(stats_rx.recv(4096).decode())
    assert "audiolevels" in msg
    # mp2 stream 0 must equal its single-stream encoding
    # (mixed-batch correctness is covered in test_mp2_batch)
