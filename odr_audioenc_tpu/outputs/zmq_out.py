"""ZeroMQ PUB output with the ODR-DabMux frame header.

This environment has no libzmq, so a minimal ZMTP 3.0 implementation (NULL
mechanism, PUB socket, connect mode) is provided in pure Python - enough for
ODR-DabMux's SUB input.  Frame header layout matches src/Outputs.h:76-99
(packed little-endian: u16 version, u16 encoder, u32 datasize, i16 L, i16 R).
CURVE encryption is not implemented (accepted keyfiles raise).
"""
import socket
import struct
import threading
from urllib.parse import urlparse

from .base import Output

ZMQ_ENCODER_AACPLUS = 1
ZMQ_ENCODER_MPEG_L2 = 2

_GREETING = b"\xff" + b"\x00" * 8 + b"\x7f" + bytes([3, 0]) + \
    b"NULL" + b"\x00" * 16 + b"\x00" * 31


def _metadata(props):
    out = b""
    for k, v in props.items():
        out += bytes([len(k)]) + k.encode() + struct.pack(">I", len(v)) + v.encode()
    return out


def _command(name, body):
    payload = bytes([len(name)]) + name.encode() + body
    if len(payload) < 256:
        return bytes([0x04, len(payload)]) + payload
    return b"\x06" + struct.pack(">Q", len(payload)) + payload


def _message(data):
    if len(data) < 256:
        return bytes([0x00, len(data)]) + data
    return b"\x02" + struct.pack(">Q", len(data)) + data


class ZmtpPubConnection(threading.Thread):
    """One outgoing PUB connection with auto-reconnect."""

    def __init__(self, host, port):
        super().__init__(daemon=True)
        self.host, self.port = host, port
        self.sock = None
        self.lock = threading.Lock()
        self._connect()

    def _connect(self):
        try:
            s = socket.create_connection((self.host, self.port), timeout=2.0)
            s.settimeout(2.0)
            s.sendall(_GREETING)
            self._recv_exact(s, 64)  # peer greeting
            s.sendall(_command("READY", _metadata({"Socket-Type": "PUB"})))
            self._read_frame(s)      # peer READY
            s.settimeout(0.0)        # non-blocking from here (dontwait)
            self.sock = s
        except OSError:
            self.sock = None

    @staticmethod
    def _recv_exact(s, n):
        buf = b""
        while len(buf) < n:
            chunk = s.recv(n - len(buf))
            if not chunk:
                raise OSError("peer closed")
            buf += chunk
        return buf

    def _read_frame(self, s):
        flags = self._recv_exact(s, 1)[0]
        if flags & 0x02:
            size = struct.unpack(">Q", self._recv_exact(s, 8))[0]
        else:
            size = self._recv_exact(s, 1)[0]
        return flags, self._recv_exact(s, size)

    def send(self, data):
        with self.lock:
            if self.sock is None:
                self._connect()
                if self.sock is None:
                    return False
            try:
                # drain pending subscribe messages (non-blocking)
                try:
                    while True:
                        if not self.sock.recv(4096):
                            raise OSError
                except BlockingIOError:
                    pass
                self.sock.sendall(_message(data))
                return True
            except OSError:
                try:
                    self.sock.close()
                except OSError:
                    pass
                self.sock = None
                return False


class ZmqOutput(Output):
    def __init__(self, uri, keyfile=None):
        super().__init__()
        if keyfile:
            raise NotImplementedError("CURVE encryption not available without libzmq")
        u = urlparse(uri)
        if u.scheme != "tcp":
            raise ValueError(f"only tcp:// ZMQ outputs supported, got {uri}")
        self.conn = ZmtpPubConnection(u.hostname, u.port)
        self.encoder = ZMQ_ENCODER_AACPLUS

    def set_encoder_type(self, is_dabplus):
        self.encoder = ZMQ_ENCODER_AACPLUS if is_dabplus else ZMQ_ENCODER_MPEG_L2

    def write_frame(self, buf):
        hdr = struct.pack("<HHIhh", 1, self.encoder, len(buf),
                          self.audio_left, self.audio_right)
        return self.conn.send(hdr + buf)
