"""CurveZMQ security: primitive test vectors (RFC 7748, NaCl, spec:32) and
an end-to-end encrypted PUB/SUB loopback against our ZMTP implementation."""
import os
import socket
import struct
import threading

import numpy as np
import pytest

from odr_audioenc_tpu.outputs import curve as C


def test_x25519_rfc7748_vectors():
    k = bytes.fromhex(
        "a546e36bf0527c9d3b16154b82465edd62144c0ac1fc5a18506a2244ba449ac4")
    u = bytes.fromhex(
        "e6db6867583030db3594c1a424b15f7c726624ec26b3353b10a903a6d0ab1c4c")
    out = C.x25519(k, u)
    assert out.hex() == \
        "c3da55379de9c6908e94ea4df28d084f32eccf03491c71f754b4075577a28552"
    # base point mult, cross-checked against OpenSSL (pyca/cryptography)
    a = bytes.fromhex(
        "77076d0a7318a57d3c16c17251b26645df4c2f87ebc0992ab177fba51db92c2a")
    assert C.x25519_base(a).hex() == \
        "8520f0098930a754748b7ddcb43ef75a0dbf3a0d26381af4eba4a98eaa9b4e6a"
    try:
        from cryptography.hazmat.primitives.asymmetric.x25519 import \
            X25519PrivateKey
        from cryptography.hazmat.primitives import serialization
        pub = X25519PrivateKey.from_private_bytes(a).public_key().public_bytes(
            serialization.Encoding.Raw, serialization.PublicFormat.Raw)
        assert pub == C.x25519_base(a)
    except ImportError:
        pass


def test_x25519_shared_secret():
    apub, asec = C.keypair()
    bpub, bsec = C.keypair()
    assert C.x25519(asec, bpub) == C.x25519(bsec, apub)


def test_secretbox_nacl_vector():
    """The NaCl crypto_box test vector (tests/box.c) via beforenm."""
    alicesk = bytes.fromhex(
        "77076d0a7318a57d3c16c17251b26645df4c2f87ebc0992ab177fba51db92c2a")
    bobpk = bytes.fromhex(
        "de9edb7d7b7dc1b4d35b61c2ece435373f8343c85b78674dadfc7e146f882b4f")
    nonce = bytes.fromhex(
        "69696ee955b62b73cd62bda875fc73d68219e0036b7a0b37")
    m = bytes.fromhex(
        "be075fc53c81f2d5cf141316ebeb0c7b5228c52a4c62cbd44b66849b64244ffc"
        "e5ecbaaf33bd751a1ac728d45e6c61296cdc3c01233561f41db66cce314adb31"
        "0e3be8250c46f06dceea3a7fa1348057e2f6556ad6b1318a024a838f21af1fde"
        "048977eb48f59ffd4924ca1c60902e52f0a089bc76897040e082f93776384864"
        "5e0705")
    want = (
        "f3ffc7703f9400e52a7dfb4b3d3305d98e993b9f48681273c29650ba32fc76ce"
        "48332ea7164d96a4476fb8c531a1186ac0dfc17c98dce87b4da7f011ec48c972"
        "71d2c20f9b928fe2270d6fb863d51738b48eeee314a7cc8ab932164548e526ae"
        "90224368517acfeabd6bb3732bc0e9da99832b61ca01b6de56244a9e88d5f9b3"
        "7973f622a43d14a6599b1f654cb45a74e355a5")
    k = C.box_beforenm(bobpk, alicesk)
    boxed = C.box_afternm(m, nonce, k)
    assert boxed.hex() == want
    assert C.box_open_afternm(boxed, nonce, k) == m


def test_poly1305_rfc8439_vector():
    key = bytes.fromhex(
        "85d6be7857556d337f4452fe42d506a80103808afb0db2fd4abff6af4149f51b")
    msg = b"Cryptographic Forum Research Group"
    assert C.poly1305(msg, key).hex() == "a8061dc1305136c6c22b8baf0c0127a9"


def test_z85_spec_vector():
    assert C.z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) \
        == "HelloWorld"
    assert C.z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])


def test_curve_handshake_and_messages():
    """Server/client session objects complete the spec:25 handshake and
    exchange MESSAGEs both ways."""
    spub, ssec = C.keypair()
    srv = C.CurveServerSession(ssec)
    cli = C.CurveClientSession(spub)
    welcome = srv.hello(cli.hello())
    cli.welcome(welcome)
    ready = srv.initiate(cli.initiate())
    meta = cli.ready(ready)
    assert b"Socket-Type" in meta
    for i in range(3):
        payload = os.urandom(100 + i)
        flags, out = cli.decrypt(srv.encrypt(payload))
        assert flags == 0 and out == payload
    # replay is rejected
    msg = srv.encrypt(b"x")
    cli.decrypt(msg)
    srv2 = C.CurveServerSession(ssec)
    with pytest.raises(ValueError):
        srv.decrypt(msg)  # wrong direction nonce prefix fails the MAC


def test_curve_rejects_wrong_server_key():
    spub, ssec = C.keypair()
    other_pub, other_sec = C.keypair()
    srv = C.CurveServerSession(other_sec)      # imposter server
    cli = C.CurveClientSession(spub)           # expects the real key
    with pytest.raises(ValueError):
        srv.hello(cli.hello())                 # HELLO box fails to open


def test_encrypted_zmq_loopback():
    """End-to-end: ZmqOutput with a key file vs a CURVE SUB client over a
    real TCP socket (the role ODR-DabMux plays)."""
    from odr_audioenc_tpu.outputs.zmq_out import ZmqOutput, _greeting, _command

    spub, ssec = C.keypair()
    keyfile = "/tmp/curve_test.key"
    with open(keyfile, "w") as f:
        f.write(C.z85_encode(ssec))

    lsock = socket.socket()
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(1)
    port = lsock.getsockname()[1]
    got = []

    def sub_thread():
        s, _ = lsock.accept()
        s.settimeout(5.0)
        cli = C.CurveClientSession(spub)

        def recv_exact(n):
            buf = b""
            while len(buf) < n:
                c = s.recv(n - len(buf))
                assert c
                buf += c
            return buf

        def read_command():
            flags = recv_exact(1)[0]
            size = struct.unpack(">Q", recv_exact(8))[0] if flags & 2 \
                else recv_exact(1)[0]
            payload = recv_exact(size)
            nlen = payload[0]
            return payload[1:1 + nlen], payload[1 + nlen:]

        s.sendall(_greeting("CURVE", False))
        recv_exact(64)
        s.sendall(_command("HELLO", cli.hello()))
        name, body = read_command()
        assert name == b"WELCOME"
        cli.welcome(body)
        s.sendall(_command("INITIATE", cli.initiate()))
        name, body = read_command()
        assert name == b"READY"
        cli.ready(body)
        for _ in range(2):
            name, body = read_command()
            assert name == b"MESSAGE"
            flags, payload = cli.decrypt(body)
            got.append(payload)
        s.close()

    t = threading.Thread(target=sub_thread, daemon=True)
    t.start()
    out = ZmqOutput(f"tcp://127.0.0.1:{port}", keyfile=keyfile)
    out.set_encoder_type(False)
    frames = [os.urandom(300), os.urandom(3000)]
    assert out.write_frame(frames[0])
    assert out.write_frame(frames[1])
    t.join(timeout=10)
    assert len(got) == 2
    for f, g in zip(frames, got):
        ver, enc, size, L, R = struct.unpack("<HHIhh", g[:12])
        assert (ver, enc, size) == (1, 2, len(f))
        assert g[12:] == f
    lsock.close()
