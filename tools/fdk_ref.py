"""ctypes wrappers over the reference fdk-aac encoder/decoder .so builds.

Test-oracle only (golden DAB+ superframe generation and loopback decoding);
the encoder package never imports this.  Mirrors the reference usage:
  encoder: prepare_aac_encoder + the aacEncEncode loop (odr-audioenc.cpp)
  decoder: superframe parse + aacDecoder_* (src/AACDecoder.cpp)
"""
import ctypes
import subprocess
from pathlib import Path

import numpy as np

SCRATCH = Path(__file__).resolve().parent.parent / ".scratch"

AOT_DABPLUS_AAC_LC, AOT_DABPLUS_SBR, AOT_DABPLUS_PS = 135, 136, 137
TT_DABPLUS = 13
# AACENC_PARAM ids (aacenc_lib.h)
P_AOT, P_BITRATE, P_BITRATEMODE, P_SAMPLERATE = 0x0100, 0x0101, 0x0102, 0x0103
P_SBR_MODE = 0x0104
P_GRANULE_LENGTH, P_CHANNELMODE, P_CHANNELORDER = 0x0105, 0x0106, 0x0107
P_SBR_RATIO = 0x0108
P_AFTERBURNER, P_BANDWIDTH = 0x0200, 0x0203
P_TRANSMUX = 0x0300


class _BufDesc(ctypes.Structure):
    _fields_ = [("numBufs", ctypes.c_int), ("bufs", ctypes.POINTER(ctypes.c_void_p)),
                ("bufferIdentifiers", ctypes.POINTER(ctypes.c_int)),
                ("bufSizes", ctypes.POINTER(ctypes.c_int)),
                ("bufElSizes", ctypes.POINTER(ctypes.c_int))]


class _InArgs(ctypes.Structure):
    _fields_ = [("numInSamples", ctypes.c_int), ("numAncBytes", ctypes.c_int)]


class _OutArgs(ctypes.Structure):
    _fields_ = [("numOutBytes", ctypes.c_int), ("numInSamples", ctypes.c_int),
                ("numAncBytes", ctypes.c_int), ("bitResState", ctypes.c_int)]


def ensure_encoder():
    so = SCRATCH / "libfdk-enc.so"
    if not so.exists():
        subprocess.run(["bash", str(Path(__file__).parent / "build_fdk_encoder.sh")],
                       check=True)
    return so


def ensure_decoder():
    so = SCRATCH / "libfdk-dec.so"
    if not so.exists():
        subprocess.run(["bash", str(Path(__file__).parent / "build_fdk_decoder.sh")],
                       check=True)
    return so


class FdkEncoder:
    """Reference DAB+ encoder: feeds enc_calls_per_output granules per
    superframe, returns 110*subch-byte superframes (pre-RS)."""

    def __init__(self, channels=2, sample_rate=48000, subchannel_index=12,
                 aot=None, afterburner=1, bandwidth=0):
        self.lib = ctypes.CDLL(str(ensure_encoder()))
        lib = self.lib
        self.channels = channels
        h = ctypes.c_void_p()
        assert lib.aacEncOpen(ctypes.byref(h), 0x01 | 0x02 | 0x04, channels) == 0
        self.h = h
        if aot is None:
            if channels == 2 and subchannel_index <= 6:
                aot = AOT_DABPLUS_PS
            elif (channels == 1 and subchannel_index <= 8) or \
                 (channels == 2 and subchannel_index <= 10):
                aot = AOT_DABPLUS_SBR
            else:
                aot = AOT_DABPLUS_AAC_LC
        self.aot = aot

        def setp(p, v):
            r = lib.aacEncoder_SetParam(h, p, v)
            assert r == 0, f"SetParam {hex(p)}={v} failed: {hex(r & 0xffffffff)}"
        setp(P_AOT, aot)
        setp(P_SAMPLERATE, sample_rate)
        setp(P_CHANNELMODE, channels)  # MODE_1=1, MODE_2=2
        setp(P_CHANNELORDER, 1)
        setp(P_GRANULE_LENGTH, 960)
        setp(P_TRANSMUX, TT_DABPLUS)
        setp(P_BITRATE, subchannel_index * 8000)
        setp(P_AFTERBURNER, afterburner)
        if bandwidth:
            setp(P_BANDWIDTH, bandwidth)
        assert lib.aacEncEncode(h, None, None, None, None) == 0
        self.subch = subchannel_index
        self.sample_rate = sample_rate
        if aot == AOT_DABPLUS_AAC_LC:
            self.calls_per_superframe = sample_rate // 8000
        else:
            self.calls_per_superframe = sample_rate // 16000
        self.granule = 960 * (1 if aot == AOT_DABPLUS_AAC_LC else 2)

    def encode_granule(self, pcm):
        """pcm: int16 interleaved [granule*channels].  Returns superframe bytes
        (empty except on the last call of each superframe)."""
        pcm = np.ascontiguousarray(pcm, np.int16)
        out = np.zeros(24 * 120, np.uint8)
        inp = ctypes.c_void_p(pcm.ctypes.data)
        insize = ctypes.c_int(pcm.nbytes)
        inel = ctypes.c_int(2)
        inid = ctypes.c_int(0)  # IN_AUDIO_DATA
        in_buf = _BufDesc(1, ctypes.pointer(inp), ctypes.pointer(inid),
                          ctypes.pointer(insize), ctypes.pointer(inel))
        outp = ctypes.c_void_p(out.ctypes.data)
        outsize = ctypes.c_int(out.nbytes)
        outel = ctypes.c_int(1)
        outid = ctypes.c_int(3)  # OUT_BITSTREAM_DATA
        out_buf = _BufDesc(1, ctypes.pointer(outp), ctypes.pointer(outid),
                           ctypes.pointer(outsize), ctypes.pointer(outel))
        ia = _InArgs(len(pcm), 0)
        oa = _OutArgs()
        r = self.lib.aacEncEncode(self.h, ctypes.byref(in_buf), ctypes.byref(out_buf),
                                  ctypes.byref(ia), ctypes.byref(oa))
        assert r == 0, f"aacEncEncode failed {hex(r & 0xffffffff)}"
        return bytes(out[:oa.numOutBytes])

    def encode(self, pcm):
        """pcm: int16 [channels, n] -> list of superframes (110*subch bytes)."""
        n = pcm.shape[1]
        g = self.granule
        sfs = []
        for start in range(0, n - g + 1, g):
            chunk = pcm[:, start:start + g]
            inter = np.empty(g * self.channels, np.int16)
            for c in range(self.channels):
                inter[c::self.channels] = chunk[c]
            sf = self.encode_granule(inter)
            if sf:
                sfs.append(sf)
        return sfs


class FdkDecoder:
    """Loopback DAB+ superframe decoder (mirrors src/AACDecoder.cpp)."""

    def __init__(self):
        self.lib = ctypes.CDLL(str(ensure_decoder()))
        self.lib.aacDecoder_Open.restype = ctypes.c_void_p
        self.h = ctypes.c_void_p(self.lib.aacDecoder_Open(0, 1))  # TT_MP4_RAW
        assert self.h
        self.configured = False
        self.channels = 0

    def _configure(self, dac_rate, sbr_flag, aac_channel_mode, ps_flag):
        core_sr_index = (6 if sbr_flag else 3) if dac_rate else (8 if sbr_flag else 5)
        core_ch_config = 2 if aac_channel_mode else 1
        extension_sr_index = 3 if dac_rate else 5
        asc = bytearray()
        asc.append((0b00010 << 3) | (core_sr_index >> 1))
        asc.append(((core_sr_index & 1) << 7) | (core_ch_config << 3) | 0b100)
        if sbr_flag:
            asc += bytes([0x56, 0xE5, 0x80 | (extension_sr_index << 3)])
            if ps_flag:
                asc[-1] |= 0x05
                asc += bytes([0x48, 0x80])
        buf = ctypes.create_string_buffer(bytes(asc), len(asc))
        arr = (ctypes.POINTER(ctypes.c_char) * 1)(ctypes.cast(buf, ctypes.POINTER(ctypes.c_char)))
        ln = (ctypes.c_uint * 1)(len(asc))
        r = self.lib.aacDecoder_ConfigRaw(self.h, arr, ln)
        assert r == 0, f"ConfigRaw failed {hex(r & 0xffffffff)}"
        self.channels = 2 if (aac_channel_mode or ps_flag) else 1
        self.sbr = sbr_flag
        self.sample_rate = 48000 if dac_rate else 32000
        self.configured = True

    def decode_superframe(self, data):
        """data: superframe bytes WITHOUT RS parity (110*subch).
        Returns int16 [channels, n] decoded audio.  Raises on any decoder
        error or AU-ordering violation (the reference's QA criteria)."""
        data = bytes(data)
        dac_rate = bool(data[2] & 0x40)
        sbr_flag = bool(data[2] & 0x20)
        aac_channel_mode = bool(data[2] & 0x10)
        ps_flag = bool(data[2] & 0x08)
        num_aus = (3 if sbr_flag else 6) if dac_rate else (2 if sbr_flag else 4)
        au_start = [0] * (num_aus + 1)
        au_start[0] = (6 if sbr_flag else 11) if dac_rate else (5 if sbr_flag else 8)
        au_start[1] = data[3] << 4 | data[4] >> 4
        if num_aus >= 3:
            au_start[2] = (data[4] & 0x0F) << 8 | data[5]
        if num_aus >= 4:
            au_start[3] = data[6] << 4 | data[7] >> 4
        if num_aus == 6:
            au_start[4] = (data[7] & 0x0F) << 8 | data[8]
            au_start[5] = data[9] << 4 | data[10] >> 4
        au_start[num_aus] = len(data)
        for i in range(num_aus):
            if au_start[i] >= au_start[i + 1]:
                raise RuntimeError(f"AU ordering check failed: {au_start}")
        if not self.configured:
            self._configure(dac_rate, sbr_flag, aac_channel_mode, ps_flag)
        outlen = 2048 * self.channels * (2 if sbr_flag else 1)
        chunks = []
        for i in range(num_aus):
            au = data[au_start[i]:au_start[i + 1] - 2]  # strip AU CRC
            buf = ctypes.create_string_buffer(au, len(au))
            arr = (ctypes.POINTER(ctypes.c_char) * 1)(
                ctypes.cast(buf, ctypes.POINTER(ctypes.c_char)))
            sz = (ctypes.c_uint * 1)(len(au))
            valid = ctypes.c_uint(len(au))
            r = self.lib.aacDecoder_Fill(self.h, arr, sz, ctypes.byref(valid))
            assert r == 0 and valid.value == 0
            pcm = np.zeros(outlen, np.int16)
            r = self.lib.aacDecoder_DecodeFrame(
                self.h, pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
                outlen, 0)
            if r != 0:
                raise RuntimeError(f"DecodeFrame failed {hex(r & 0xffffffff)} on AU {i}")
            # the decoder may up-mix mono HE-AAC to stereo output (implicit
            # PS readiness) - use the REPORTED channel count to deinterleave,
            # then keep the configured channels
            self.lib.aacDecoder_GetStreamInfo.restype = ctypes.POINTER(ctypes.c_int)
            si = self.lib.aacDecoder_GetStreamInfo(self.h)
            out_ch = max(int(si[2]), 1)
            frame = int(si[1])
            chunks.append(pcm[:frame * out_ch].reshape(-1, out_ch).T[:self.channels])
        return np.concatenate(chunks, axis=1)
