"""Batched MP2 encoder: per-stream config, carried state, jitted encode step.

The device step advances all S streams by one 1152-sample frame and emits the
integer coding decisions (scalefactors, scfsi, allocations, quantized
codewords); byte-level packing/CRC stays on the host (pack.py), mirroring the
reference split where toolame.c:267-553 drives DSP then bit-packs.
"""
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables as T
from . import allocate, binpack, framepack, polyphase, psycho0, psycho1, psycho1_fast, psycho2, psycho3, psycho4, psycho_n1

MODE_STEREO, MODE_JOINT, MODE_DUAL, MODE_MONO = 0, 1, 2, 3
_MODE_OF = {"s": MODE_STEREO, "j": MODE_JOINT, "d": MODE_DUAL, "m": MODE_MONO}


@dataclass
class Mp2Config:
    """Per-stream static configuration (numpy arrays of shape [S])."""
    version: np.ndarray        # 1=MPEG-1, 0=MPEG-2 LSF
    sfreq_idx: np.ndarray      # header sampling_frequency index
    bitrate_idx: np.ndarray
    mode: np.ndarray           # header mode at init (0..3)
    nch: np.ndarray
    tablenum: np.ndarray
    sblimit: np.ndarray
    dab_ext: np.ndarray        # 2 or 4 scf-crc bytes
    dab_length: np.ndarray     # xpad buffer length (0 if no PAD)
    adb_full: np.ndarray       # frame bits before DAB reservation
    lg_frame: np.ndarray       # frame bytes
    low_rate: np.ndarray       # per-channel bitrate < 96 (psy1 hear offset)
    psy_rate_idx: np.ndarray   # psy-1 table index (sfreq_idx [+4 for MPEG-2])
    bitrate_kbps: np.ndarray
    slots_frac: np.ndarray     # fractional slots/frame (44.1k family padding)

    @property
    def n_streams(self):
        return len(self.version)


def make_config(streams):
    """streams: list of dicts {rate, bitrate, mode, pad_len(optional)}.
    Mirrors toolame_set_* + encode_init (toolame.c:212-262,
    encode_new.c:104-156, odr-audioenc.cpp:686-735)."""
    n = len(streams)
    f = {k: np.zeros(n, np.int32) for k in
         ["version", "sfreq_idx", "bitrate_idx", "mode", "nch", "tablenum",
          "sblimit", "dab_ext", "dab_length", "adb_full", "lg_frame",
          "psy_rate_idx", "bitrate_kbps"]}
    low_rate = np.zeros(n, bool)
    slots_frac = np.zeros(n, np.float64)
    for i, s in enumerate(streams):
        rate, br, mode = s["rate"], s["bitrate"], s["mode"]
        version, sfidx = {44100: (1, 0), 48000: (1, 1), 32000: (1, 2),
                          22050: (0, 0), 24000: (0, 1), 16000: (0, 2)}[rate]
        br_idx = list(T.BITRATE_TABLE[version]).index(br)
        m = _MODE_OF[mode]
        nch = 1 if m == MODE_MONO else 2
        br_per_ch = br // nch
        dab_ext = 4
        if version == 1 and br_per_ch < 56:
            dab_ext = 2
        sfrq = T.S_FREQ_KHZ[version][sfidx]
        if version == 1:
            if (sfrq == 48 and br_per_ch >= 56) or (56 <= br_per_ch <= 80):
                tablenum = 0
            elif sfrq != 48 and br_per_ch >= 96:
                tablenum = 1
            elif sfrq != 32 and br_per_ch <= 48:
                tablenum = 2
            else:
                tablenum = 3
        else:
            tablenum = 4
        average = (1152.0 / sfrq) * (br / 8.0)
        whole = int(average)
        slots_frac[i] = average - whole  # padding-slot lag (availbits.c:40-62)
        adb_full = whole * 8
        f["version"][i] = version
        f["sfreq_idx"][i] = sfidx
        f["bitrate_idx"][i] = br_idx
        f["mode"][i] = m
        f["nch"][i] = nch
        f["tablenum"][i] = tablenum
        f["sblimit"][i] = T.TABLE_SBLIMIT[tablenum]
        f["dab_ext"][i] = dab_ext
        f["dab_length"][i] = s.get("pad_len", 0)
        f["adb_full"][i] = adb_full
        f["lg_frame"][i] = whole
        f["psy_rate_idx"][i] = sfidx + (0 if version == 1 else 4)
        f["bitrate_kbps"][i] = br
        low_rate[i] = br_per_ch < 96
    return Mp2Config(low_rate=low_rate, slots_frac=slots_frac, **f)


class Mp2Encoder:
    """Stream-batched MP2 encoder.  One instance per (batch of) streams."""

    def __init__(self, config: Mp2Config, psy_model=1, dtype=jnp.float64,
                 fast_psy=None, pack_on_device=False):
        """fast_psy: use the fully-vectorised psy-1 (psycho1_fast) instead of
        the bit-exact masked-scan version; defaults to True for f32 (the TPU
        throughput path) and False for f64 (the validation path).
        pack_on_device: True serializes the sample section on device
        (mp2/binpack.py, host splices it after the side info); "frame"
        emits the COMPLETE frame bytes on device (mp2/framepack.py) so the
        host only patches the ScF-CRC back-bytes - the TPU-first hot path
        (device->host transfer shrinks to ~lg_frame bytes/stream)."""
        self.cfg = config
        self.psy_model = psy_model
        self.dtype = dtype
        self.pack_on_device = pack_on_device
        self.payload_bytes = int(np.max(config.lg_frame)) + 4
        self.frame_bytes = int(np.max(config.lg_frame)) + 1
        self.pad_max = int(np.max(config.dab_length))
        if fast_psy is None:
            fast_psy = jnp.dtype(dtype) != jnp.float64
        self.fast_psy = fast_psy
        S = config.n_streams
        rate_idx2 = np.repeat(config.psy_rate_idx, 2)
        if psy_model == 1:
            tabs = psycho1.make_psy1_tables(rate_idx2)
            if fast_psy:
                tabs.update(psycho1_fast.make_fast_tables(tabs))
            # keys starting with "static_" hold Python/numpy constants baked
            # into the trace (not device arrays)
            self.psy1_tabs = {k: (v if k.startswith("static_") or v is None
                                  else jnp.asarray(v))
                              for k, v in tabs.items()}
        else:
            self.psy1_tabs = None
        if psy_model == 3:
            rates = {1000.0 * T.S_FREQ_KHZ[v][si]
                     for v, si in zip(config.version, config.sfreq_idx)}
            if len(rates) != 1:
                raise ValueError("psy model 3 requires a homogeneous sample "
                                 "rate per encoder batch")
            self.psy3_tabs = psycho3.make_psy3_tables(rates.pop())
        if psy_model == 2:
            rates = {1000.0 * T.S_FREQ_KHZ[v][si]
                     for v, si in zip(config.version, config.sfreq_idx)}
            if len(rates) != 1:
                raise ValueError("psy model 2 requires a homogeneous sample "
                                 "rate per encoder batch")
            self.psy2_tabs = psycho2.make_psy2_tables(rates.pop())
        if psy_model == 4:
            rates = {1000.0 * T.S_FREQ_KHZ[v][si]
                     for v, si in zip(config.version, config.sfreq_idx)}
            if len(rates) != 1:
                raise ValueError("psy model 4 requires a homogeneous sample "
                                 "rate per encoder batch")
            self.psy2_tabs = psycho4.make_psy4_tables(rates.pop())
        if psy_model == 0:
            self.ath_min = jnp.asarray(np.stack([
                T.psy0_ath_min(1000.0 * T.S_FREQ_KHZ[v][si])
                for v, si in zip(config.version, config.sfreq_idx)]), dtype)
        self._dev = {k: jnp.asarray(getattr(config, k)) for k in
                     ["sblimit", "nch", "mode", "dab_ext", "adb_full",
                      "tablenum", "low_rate", "version"]}
        if pack_on_device == "frame":
            self._dev.update(
                {k: jnp.asarray(getattr(config, k)) for k in
                 ["bitrate_idx", "sfreq_idx", "lg_frame", "dab_length"]},
                nbal=jnp.asarray(framepack.nbal_rows(config)))
        self._step = jax.jit(partial(self._encode_step))
        # 44.1k-family padding-slot lag, advanced host-side in f64 exactly as
        # the reference's static struct (availbits.c:27-62)
        self.pad_lag = np.zeros(S, np.float64)

    def init_state(self):
        S = self.cfg.n_streams
        state = {"hist": jnp.zeros((S, 2, 480), self.dtype)}
        if self.psy_model in (2, 4):
            state["psy2"] = psycho2.init_psy2_state(S * 2, self.dtype)
        return state

    def take_state(self, state, idx):
        """Extract per-stream state rows (stream churn: a station moving to a
        rebuilt batch carries its state so its bitstream continues exactly).
        idx: stream indices; psy-2 leaves are channel-major [2S, ...]."""
        idx = np.asarray(idx)
        out = {"hist": state["hist"][idx]}
        if self.psy_model in (2, 4):
            idx2 = np.stack([2 * idx, 2 * idx + 1], 1).reshape(-1)
            out["psy2"] = {k: v[idx2] for k, v in state["psy2"].items()}
        return out

    def put_state(self, state, idx, rows):
        """Write rows (from take_state) at stream indices idx."""
        idx = np.asarray(idx)
        state = dict(state, hist=state["hist"].at[idx].set(rows["hist"]))
        if self.psy_model in (2, 4):
            idx2 = np.stack([2 * idx, 2 * idx + 1], 1).reshape(-1)
            state["psy2"] = {k: v.at[idx2].set(rows["psy2"][k])
                             for k, v in state["psy2"].items()}
        return state

    def next_padding(self):
        """Advance the padding-slot lag one frame; returns extra-slots [S]
        (available_bits, availbits.c:51-62; usepadbit TRUE, vbr FALSE)."""
        frac = self.cfg.slots_frac
        m = frac != 0
        nopad = self.pad_lag > (frac - 1.0)
        extra = (m & ~nopad).astype(np.int32)
        self.pad_lag = np.where(m, np.where(nopad, self.pad_lag - frac,
                                            self.pad_lag + (1.0 - frac)),
                                self.pad_lag)
        return extra

    def _encode_step(self, state, pcm, xpad_len, extra_slots=None,
                     xpad_buf=None):
        """pcm: [S, 2, 1152] int16; xpad_len: [S] int32; extra_slots: [S]
        padding slots this frame (44.1k family; None = no padding);
        xpad_buf: [S, pad_max] int32 X-PAD bytes (frame mode only).
        Returns (state', outputs) - see pack.py for the consumer."""
        cfg = self._dev
        dtype = self.dtype
        S = pcm.shape[0]
        frame = pcm.astype(dtype) / T.SCALE

        sb_s, hist = polyphase.polyphase_frame(state["hist"], frame, dtype)
        sb_sample = sb_s.reshape(S, 2, 3, 12, 32)

        sblimit = cfg["sblimit"]
        nch = cfg["nch"]
        sbmask = jnp.arange(32)[None, :] < sblimit[:, None]

        sf_index = allocate.scalefactor_calc(sb_sample, dtype)
        sf_index = jnp.where(sbmask[:, None, None, :], sf_index, 0)
        scale_max = allocate.find_sf_max(sf_index, sblimit, dtype)

        j_sample = allocate.combine_lr(sb_sample)  # [S,3,12,32]
        j_scale = allocate.scalefactor_calc(j_sample, dtype)
        j_scale = jnp.where(sbmask[:, None, :], j_scale, 0)

        if self.psy_model == 1:
            window = jnp.concatenate([state["hist"][..., 288:], frame[..., :832]],
                                     axis=-1).reshape(S * 2, 1024)
            psy_fn = psycho1_fast.psycho_1_fast if self.fast_psy else psycho1.psycho_1
            smr = psy_fn(window, scale_max.reshape(S * 2, 32),
                         self.psy1_tabs,
                         jnp.repeat(cfg["low_rate"], 2),
                         dtype).reshape(S, 2, 32)
        elif self.psy_model == 0:
            smr = psycho0.psycho_0(sf_index, self.ath_min[:, None, :], dtype)
        elif self.psy_model == -1:
            # null model (psycho_n1.c): canned SNRs, no modelling
            smr = psycho_n1.psycho_n1(S, dtype)
        elif self.psy_model in (2, 4):
            # model 4 shares model 2's runtime with its own tables
            raw = pcm.astype(dtype).reshape(S * 2, 1152)
            smr, psy2_state = psycho2.psycho_2(raw, state["psy2"],
                                               self.psy2_tabs, dtype)
            smr = smr.reshape(S, 2, 32)
        elif self.psy_model == 3:
            window = jnp.concatenate([state["hist"][..., 288:], frame[..., :832]],
                                     axis=-1).reshape(S * 2, 1024)
            smr = psycho3.psycho_3(window, scale_max.reshape(S * 2, 32),
                                   self.psy3_tabs,
                                   jnp.repeat(cfg["low_rate"], 2),
                                   dtype).reshape(S, 2, 32)
        else:
            raise NotImplementedError(f"psy model {self.psy_model}")

        sf_adj, scfsi = allocate.sf_transmission_pattern(sf_index)
        sf_adj = jnp.where(sbmask[:, None, None, :], sf_adj, 0)

        ft = allocate._frame_tables(cfg["tablenum"])
        adb = cfg["adb_full"] - cfg["dab_ext"] * 8 - \
            jnp.where(xpad_len > 0, xpad_len, 2) * 8
        if extra_slots is not None:
            adb = adb + extra_slots * 8

        is_joint = cfg["mode"] == MODE_JOINT
        stereo_sel, mode_ext, jsbound = allocate.js_mode_select(
            smr, scfsi, ft, sblimit, nch, is_joint, adb, dtype)
        mode_final = jnp.where(is_joint,
                               jnp.where(stereo_sel, MODE_STEREO, MODE_JOINT),
                               cfg["mode"])

        bit_alloc, adb_left = allocate.a_bit_allocation(
            smr, scfsi, ft, sblimit, nch, jsbound, adb, dtype)

        sbband = allocate.quantize(sf_adj, sb_sample, j_scale, j_sample,
                                   bit_alloc, ft, sblimit, nch, jsbound, dtype)

        if self.pack_on_device == "frame":
            # complete frames on device; only the tiny frame/scf_vals
            # arrays cross to the host (framepack.py)
            fr_in = {"sf_index": sf_adj.astype(jnp.int32),
                     "scfsi": scfsi.astype(jnp.int32),
                     "bit_alloc": bit_alloc.astype(jnp.int32),
                     "mode": mode_final.astype(jnp.int32),
                     "mode_ext": mode_ext.astype(jnp.int32),
                     "jsbound": jsbound.astype(jnp.int32)}
            if extra_slots is not None:
                fr_in["extra"] = extra_slots.astype(jnp.int32)
            frame, scf_vals = framepack.pack_full_frame(
                self._dev, fr_in, sbband, ft, xpad_len, xpad_buf,
                self.frame_bytes)
            # ONE output leaf: the device->host tunnel costs ~9 ms per
            # transfer regardless of size, so frame + ScF-CRC values + mode
            # + padding slot ride one uint8 buffer [S, n_bytes + 6]
            extra_u8 = (extra_slots if extra_slots is not None else
                        jnp.zeros((S,), jnp.int32)).astype(jnp.uint8)
            wire = jnp.concatenate(
                [frame, scf_vals,
                 mode_final.astype(jnp.uint8)[:, None],
                 extra_u8[:, None]], axis=1)
            out = {"wire": wire}
            new_state = {"hist": hist}
            if self.psy_model in (2, 4):
                new_state["psy2"] = psy2_state
            return new_state, out

        out = {
            "sf_index": sf_adj.astype(jnp.uint8),
            "scfsi": scfsi.astype(jnp.uint8),
            "bit_alloc": bit_alloc.astype(jnp.uint8),
            "mode": mode_final.astype(jnp.int32),
            "mode_ext": mode_ext.astype(jnp.int32),
            "jsbound": jsbound.astype(jnp.int32),
            "adb_left": adb_left.astype(jnp.int32),
            "smr": smr,
        }
        if self.pack_on_device:
            payload, payload_bits = binpack.pack_payload(
                sbband, bit_alloc, ft, sblimit, nch, jsbound,
                self.payload_bytes)
            out["payload"] = payload
            out["payload_bits"] = payload_bits
        else:
            # uint16 halves the device->host traffic (quantized mantissas
            # are at most 16 bits); the host widens before the native call
            out["sbband"] = sbband.astype(jnp.uint16)
        if extra_slots is not None:
            out["extra"] = extra_slots.astype(jnp.int32)
        new_state = {"hist": hist}
        if self.psy_model in (2, 4):
            new_state["psy2"] = psy2_state
        return new_state, out

    def encode_step(self, state, pcm, xpad_len=None, xpad_buf=None):
        S = self.cfg.n_streams
        if xpad_len is None:
            xpad_len = jnp.zeros((S,), jnp.int32)
        extra = None
        if (self.cfg.slots_frac != 0).any():
            extra = jnp.asarray(self.next_padding())
        if xpad_buf is not None:
            xpad_buf = jnp.asarray(xpad_buf, jnp.int32)
        return self._step(state, jnp.asarray(pcm), jnp.asarray(xpad_len),
                          extra, xpad_buf)
