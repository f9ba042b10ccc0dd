"""Misc parity components: drift compensation, EDI TCP server fan-out,
ClockTAI, VU meter."""
import socket
import time

import numpy as np

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
