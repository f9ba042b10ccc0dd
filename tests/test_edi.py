"""EDI wire format: byte-exact vs the reference edioutput classes, plus a
socket-level loopback of the full sender."""
import ctypes
import socket
import struct
import subprocess
import time
from pathlib import Path

import numpy as np
import pytest

from odr_audioenc_tpu.outputs import edi_out as E

SCRATCH = Path(__file__).resolve().parent.parent / ".scratch"


def _shim():
    so = SCRATCH / "libedi_ref.so"
    if not so.exists():
        subprocess.run(["bash", str(Path(__file__).parent.parent / "tools" / "build_edi_shim.sh")],
                       check=True)
    return ctypes.CDLL(str(so))


def test_tagpacket_matches_reference():
    lib = _shim()
    payload = bytes(np.random.default_rng(1).integers(0, 256, 264, endpoint=False).astype(np.uint8))
    out = ctypes.create_string_buffer(4096)
    n = lib.ref_tagpacket(payload, len(payload), 1, 5, 1234567, 0x00C000,
                          -900, -800, 3, out, len(out))
    assert n > 0
    # ours with the same state
    dsti = E.TagDSTI()
    dsti.stihf = False
    dsti.atstf = True
    dsti.utco = 5
    dsti.seconds = 1234567
    dsti.tsta = 0x00C000
    dsti.dlfc = 3
    tags = [E.tag_star_ptr(b"DSTI"), dsti.assemble(), E.tag_ssm(payload),
            E.tag_odr_audio_levels(-900, -800)]
    ours = E.tag_packet(tags, 8)
    assert ours == out.raw[:n]


def test_afpacket_matches_reference():
    lib = _shim()
    payload = bytes(np.random.default_rng(2).integers(0, 256, 200).astype(np.uint8))
    out = ctypes.create_string_buffer(4096)
    n = lib.ref_afpacket(payload, len(payload), 42, out, len(out))
    af = E.AFPacketiser()
    af.seq = 42
    ours = af.assemble(payload)
    assert ours == out.raw[:n]


@pytest.mark.parametrize("aflen,m", [(500, 2), (1340, 3), (207 * 3 + 5, 1)])
def test_pft_matches_reference(aflen, m):
    lib = _shim()
    af = bytes(np.random.default_rng(aflen).integers(0, 256, aflen).astype(np.uint8))
    out = ctypes.create_string_buffer(65536)
    sizes = (ctypes.c_int * 64)()
    n = lib.ref_pft(af, len(af), m, 7, out, len(out), sizes, 64)
    assert n > 0
    ref_frags = []
    off = 0
    for i in range(n):
        ref_frags.append(out.raw[off:off + sizes[i]])
        off += sizes[i]
    pft = E.PFT(m=m)
    pft.pseq = 7
    ours = pft.assemble(af)
    assert len(ours) == n
    assert ours == ref_frags


def test_edi_udp_loopback():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]

    conf = E.EdiConfig(enable_pft=True, fec=2,
                       destinations=[E.EdiDestination("udp", "127.0.0.1", port)])
    outp = E.EdiOutput(conf, tist=True)
    payload = bytes(range(256)) * 4
    outp.update_audio_levels(-1000, -2000)
    assert outp.write_frame(payload)

    frags = []
    try:
        while True:
            frags.append(rx.recv(4096))
    except socket.timeout:
        pass
    outp.close()
    assert len(frags) >= 2
    # validate PF headers and reassemble
    chunks = {}
    for f in frags:
        assert f[:2] == b"PF"
        findex = int.from_bytes(f[4:7], "big")
        fcount = int.from_bytes(f[7:10], "big")
        plen = int.from_bytes(f[10:12], "big")
        assert plen & 0x8000  # FEC
        hdr_len = 12 + 2  # + RSk/RSz
        crc = int.from_bytes(f[hdr_len:hdr_len + 2], "big")
        assert E.crc16_genibus(f[:hdr_len]) == crc
        rsk, rsz = f[12], f[13]
        chunks[findex] = f[hdr_len + 2:]
    n = fcount
    frag_size = len(chunks[0])
    rs_block = bytearray(n * frag_size)
    for i, frag in chunks.items():
        rs_block[i::n] = frag
    # strip per-chunk RS parity and zero pad
    num_chunks = -(-(len(rs_block)) // (rsk + 48))
    af = b""
    for c in range(num_chunks):
        af += bytes(rs_block[c * (rsk + 48):c * (rsk + 48) + rsk])
    assert af[:2] == b"AF"
    taglen = int.from_bytes(af[2:6], "big")
    af = af[:10 + taglen + 2]  # drop fragment/chunk zero padding
    tag = af[10:10 + taglen]
    assert E.crc16_genibus(af[:-2]) == int.from_bytes(af[-2:], "big")
    # find our ss payload inside the tag packet
    assert tag[:4] == b"*ptr"
    pos = 0
    found = False
    while pos + 8 <= len(tag):
        name = tag[pos:pos + 4]
        ln_bits = int.from_bytes(tag[pos + 4:pos + 8], "big")
        ln = ln_bits // 8
        if name[:2] == b"ss":
            assert tag[pos + 8 + 3: pos + 8 + ln] == payload
            found = True
        pos += 8 + ln
        if name == b"\x00\x00\x00\x00":
            break
    assert found
