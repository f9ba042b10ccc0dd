"""Misc parity components: drift compensation, EDI TCP server fan-out,
ClockTAI, VU meter."""
import socket
import time

import numpy as np
import pytest

from odr_audioenc_tpu.io.drift import expand_missing_samples
from odr_audioenc_tpu.outputs import edi_out as E
from odr_audioenc_tpu.host.clocktai import ClockTAI
from odr_audioenc_tpu.host.sidecars import level


def test_expand_missing_samples():
    # 100 samples stereo, 95 valid -> 5 duplicated evenly (<10% missing)
    n, valid = 100, 95
    buf = bytearray()
    for i in range(valid):
        buf += int(i).to_bytes(2, "little") * 2
    buf += bytes(2 * 2 * (n - valid))
    expand_missing_samples(buf, 2, valid * 4)
    vals = np.frombuffer(bytes(buf), np.int16)[::2]
    assert len(vals) == n
    assert vals[-1] == valid - 1 and (np.diff(vals) >= 0).all()
    assert (np.diff(vals) == 0).sum() == n - valid

    # > 10% missing: zero fill
    buf2 = bytearray(bytes(4 * 100))
    expand_missing_samples(buf2, 2, 4 * 50)
    assert bytes(buf2[200:]) == bytes(200)


def test_edi_tcp_server_fanout():
    conf = E.EdiConfig(enable_pft=False,
                       destinations=[E.EdiDestination("tcp-server", "", 0,
                                                      preroll_buffers=2)])
    out = E.EdiOutput(conf)
    out.write_frame(b"x" * 64)  # starts the sender/dispatcher
    disp = out.sender.socks[0][1]
    c1 = socket.create_connection(("127.0.0.1", disp.port), timeout=2)
    c2 = socket.create_connection(("127.0.0.1", disp.port), timeout=2)
    time.sleep(0.1)
    out.write_frame(b"y" * 64)
    time.sleep(0.2)
    c1.settimeout(1.0)
    c2.settimeout(1.0)
    d1 = c1.recv(65536)
    d2 = c2.recv(65536)
    assert d1[:2] == b"AF" and d2[:2] == b"AF"
    # preroll delivered the first AF packet too
    assert len(d1) >= len(d2) // 2
    out.close()


def test_clocktai_builtin():
    c = ClockTAI(cache_path="/nonexistent/leap")
    assert c.get_offset(1700000000) == 37  # 2023
    assert c.get_offset(1400000000) == 35  # 2014


def test_vu_meter():
    assert level(0, 0) == ""
    assert level(0, 32767) in ("!=====", "======")
    assert len(level(1, 8000)) <= 6


def test_log_backends(tmp_path):
    """Logger + file/tracer backends (contrib/Log.h semantics)."""
    from odr_audioenc_tpu.host.log import Logger, LogToFile, LogTracer, TRACE
    lg = Logger()
    f1 = tmp_path / "enc.log"
    f2 = tmp_path / "trace.csv"
    lg.register_backend(LogToFile(str(f1)))
    lg.register_backend(LogTracer(str(f2)))
    lg.level("warn")("queue underrun")
    lg.level("info")("hello")
    lg.log(TRACE, "frame,1")
    txt = f1.read_text()
    assert "WARN" in txt and "queue underrun" in txt
    assert "hello" in txt and "frame,1" not in txt  # trace only in tracer
    tr = f2.read_text().strip().splitlines()
    assert tr[0].endswith("TRACER,startup")
    assert tr[-1].split(",", 1)[1] == "frame,1"


@pytest.mark.slow
def test_aacenc_cli_loas_roundtrip(tmp_path):
    """aac-enc equivalent (odr_audioenc_tpu.aacenc_cli): WAV -> LOAS/LATM
    with a 960-frame ASC, decodable by the reference decoder in
    TT_MP4_LOAS mode (fdk-aac/aac-enc.c analogue; the 960 core cannot be
    signalled in ADTS, hence LOAS)."""
    import ctypes
    import wave
    import numpy as np
    import signals
    import fdk_ref
    from odr_audioenc_tpu import aacenc_cli

    sig = signals.music_like(30)
    reps = -(-48000 * 3 // sig.shape[1])
    sig = np.tile(sig, (1, reps))[:, :48000 * 3]
    wav = tmp_path / "in.wav"
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(48000)
        w.writeframes(sig.T.astype("<i2").tobytes())
    out = tmp_path / "out.loas"
    assert aacenc_cli.main(["-r", "96000", str(wav), str(out)]) == 0

    lib = ctypes.CDLL(str(fdk_ref.ensure_decoder()))
    lib.aacDecoder_Open.restype = ctypes.c_void_p
    h = ctypes.c_void_p(lib.aacDecoder_Open(10, 1))    # TT_MP4_LOAS
    assert h
    data = out.read_bytes()
    buf = ctypes.create_string_buffer(data, len(data))
    arr = (ctypes.POINTER(ctypes.c_char) * 1)()
    ln = (ctypes.c_uint * 1)(len(data))
    valid = (ctypes.c_uint * 1)(len(data))
    pcmbuf = np.zeros(2048 * 8, np.int16)
    nf = 0
    pcm = []
    while True:
        if valid[0] > 0:
            off = len(data) - valid[0]
            arr[0] = ctypes.cast(ctypes.byref(buf, off),
                                 ctypes.POINTER(ctypes.c_char))
            ln[0] = valid[0]
            assert lib.aacDecoder_Fill(h, arr, ln, valid) == 0
        r = lib.aacDecoder_DecodeFrame(
            h, pcmbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
            pcmbuf.size, 0)
        if r == 0x1002:                                # NOT_ENOUGH_BITS
            if valid[0] == 0:
                break
            continue
        assert r == 0, hex(r & 0xffffffff)
        pcm.append(pcmbuf[:960 * 2].reshape(960, 2).T.copy())
        nf += 1
    assert nf >= 48000 * 3 // 960 - 2                  # ~all AUs decoded
    d = np.concatenate(pcm, -1).astype(np.float64)
    src = sig.astype(np.float64)
    m = 2 * 48000
    c = np.correlate(d[0, :m], src[0, :m], "full")
    lag = int(np.argmax(np.abs(c))) - (m - 1)
    nn = min(src.shape[1], d.shape[1] - lag) - 2000
    err = d[:2, lag:lag + nn] - src[:, :nn]
    snr = 10 * np.log10((src[:, :nn] ** 2).sum()
                        / max((err ** 2).sum(), 1e-9))
    assert snr > 10, snr
