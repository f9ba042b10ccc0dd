"""Batched DAB+ encoder model: per-stream config, carried MDCT state, jitted
superframe step + host packing glue.

v1 scope: AAC-LC with the 960 transform (long windows), 48/32 kHz, mono or
stereo, full superframe/RS framing.  SBR and PS land in later revisions.
"""
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import encode as E
from . import tables as AT
from ..host.aacpack import SuperframePacker, write_au

# samples (full rate) the decoder's SBR envelope application LEADS the
# decoded core content by (QMF analysis/synthesis group delays on the two
# paths differ; measured with tone-step and gated-noise loopbacks).  The
# envelope for AU n is therefore measured over core samples
# [n*au - SBR_SHIFT, (n+1)*au - SBR_SHIFT): exactly the span whose patch
# content the decoder will scale with it - a loud envelope can then never
# land on a silent patch (gain-explosion junk at onsets).
SBR_SHIFT = 2304
# PS parameter application span lead: the PS data rides in the same FIL
# element but the decoder interpolates each parameter set from the previous
# one across the span, so the effective image lags ~half an AU behind the
# envelope span; 1344 = SBR_SHIFT - au/2 measured best on the PEAQ corpus
PS_SHIFT = 1344


@dataclass
class DabPlusConfig:
    sample_rate: int
    subch: int           # subchannel index = bitrate / 8000
    channels: int
    aot: str = "lc"      # "lc" (AAC-LC) | "sbr" (HE-AAC) | "ps" (HE-AAC v2)
    pad_len: int = 0     # max X-PAD bytes per AU (DSE ancillary data)
    bandwidth: int = 0   # -B core-coder bandwidth override in Hz
                         # (AACENC_BANDWIDTH, odr-audioenc.cpp:315-318)
    afterburner: bool = True  # -A disables (AACENC_AFTERBURNER); enables the
                              # quantization refinement rounds in encode.py

    @property
    def has_sbr(self):
        return self.aot in ("sbr", "ps")

    @property
    def num_aus(self):
        return self.sample_rate // (16000 if self.has_sbr else 8000)

    @property
    def au_samples(self):
        """full-rate samples per AU."""
        return 1920 if self.has_sbr else 960

    @property
    def core_rate(self):
        return self.sample_rate // 2 if self.has_sbr else self.sample_rate

    @property
    def bitrate(self):
        return self.subch * 8000


class DabPlusEncoder:
    """One instance per homogeneous stream batch (same rate/channels/bitrate;
    mixed batches can use several instances or padding)."""

    def __init__(self, cfg: DabPlusConfig, n_streams=1, dtype=jnp.float32,
                 pack_on_device=False):
        from . import sbr as SBR
        self.cfg = cfg
        self.pack_on_device = pack_on_device
        self.S = n_streams
        self.dtype = dtype
        rate = cfg.core_rate
        self.is_sbr = cfg.aot in ("sbr", "ps")
        self.is_ps = cfg.aot == "ps"
        if self.is_ps and cfg.channels != 2:
            raise ValueError("HE-AAC v2 (PS) requires stereo input")
        # PS downmixes to mono; plain SBR keeps the channel count (stereo
        # SBR = CPE core + sbr_channel_pair_element)
        self.core_channels = 1 if self.is_ps else cfg.channels
        self.ps_nenv = SBR.ps_num_env(cfg.bitrate) if self.is_ps else 0
        self.cos_basis = jnp.asarray(AT.long_cos_basis(), dtype)
        self.wvecs = jnp.asarray(AT.window_vectors(), dtype)
        self.short_basis = jnp.asarray(AT.short_cos_basis(), dtype)
        self.band_m = jnp.asarray(AT.band_matrix(rate), dtype)
        self.bol = jnp.asarray(AT.band_of_line(rate))
        pt_np = AT.band_psy_tables(rate)
        self.pt = {k: jnp.asarray(v, dtype) for k, v in pt_np.items() if k != "nbands"}
        self.nbands = pt_np["nbands"]
        # avoid-hole tables: bitrate-aware per-band minimum-SNR ladder +
        # spread-energy slopes (adj_thr.cpp / psy_configuration.cpp)
        ch_bitrate = cfg.bitrate // (1 if cfg.aot == "ps" else cfg.channels)
        self.modify_minsnr = ch_bitrate >= 20000
        self.pt["minsnr"] = jnp.asarray(
            AT.min_snr_ladder(ch_bitrate, rate), dtype)
        spr_np = AT.spread_energy_tables(rate, ch_bitrate)
        self.pt["f_low_spr"] = jnp.asarray(spr_np["f_low"], dtype)
        self.pt["f_high_spr"] = jnp.asarray(spr_np["f_high"], dtype)
        self.sfb_off = AT.sfb_offsets(rate)
        self.sfb_off_short = AT.sfb_short_offsets(rate)
        self.nsfb_short = len(self.sfb_off_short) - 1
        # bandwidth limit by per-channel bitrate (bandwidth.cpp analogue)
        br_per_ch = cfg.bitrate / cfg.channels
        if self.is_sbr:
            self.sbr_params = SBR.SbrParams(cfg.sample_rate,
                                            bitrate=cfg.subch * 8000,
                                            channels=self.core_channels)
            bw_hz = self.sbr_params.k0 * self.sbr_params.band_hz  # crossover
            # 127-tap Kaiser(12) half-band: ~-119 dB stopband.  The old
            # 63-tap Hamming design aliased at -66 dB, which WAS the
            # SBR-mode core noise floor (measured via the PEAQ harness)
            taps = 127
            n = np.arange(taps) - (taps - 1) / 2
            h = np.sinc(n / 2.0) / 2.0 * np.kaiser(taps, 12.0)
            self.ds_filter = jnp.asarray(h, dtype)
            self.ds_taps = taps
        else:
            self.sbr_params = None
            # CBR bandwidth table for 960/1024 frames (bandwidth.cpp:114-118,
            # GetBandwidthEntry: bracket entry, no interpolation at 960)
            _BW_TAB = [(0, 3700, 5000), (12000, 5000, 6400),
                       (20000, 6900, 9640), (28000, 9600, 13050),
                       (40000, 12060, 14260), (56000, 13950, 15500),
                       (72000, 14200, 16120), (96000, 17000, 17000),
                       (576001, 17000, 17000)]
            col = 1 if cfg.channels == 1 else 2
            bw_hz = _BW_TAB[0][col]
            for i in range(len(_BW_TAB) - 1):
                if _BW_TAB[i][0] <= br_per_ch < _BW_TAB[i + 1][0]:
                    bw_hz = _BW_TAB[i][col]
                    break
            bw_hz = min(float(bw_hz), rate * 0.5)
        if cfg.bandwidth > 0:
            # user override of the core-coder bandwidth (-B)
            bw_hz = min(float(cfg.bandwidth), rate * 0.5)
        self.max_sfb = int(np.searchsorted(self.sfb_off * rate / (2 * AT.N), bw_hz)) - 1
        self.max_sfb = max(4, min(self.max_sfb, self.nbands))
        # PNS level by per-channel bitrate: the fdk LC ladder
        # (pnsparam.cpp:354-404 levelTable_lowComplexity -> tuning rows
        # pnsInfoTab_lowComplexity: startFreq 4100 Hz, refTonality 0.10,
        # refPower 0.05 for levels 2-3, 0.20 for the 48 kbps LOWSUBST row;
        # PNS is OFF above 48 kbps/channel and below 28)
        ref_power = None
        if 28000 <= br_per_ch < 48000:
            ref_power = 0.05
        elif br_per_ch == 48000:
            ref_power = 0.20
        if ref_power is not None:
            self.pt["pns_start"] = int(
                np.searchsorted(self.sfb_off * rate / (2 * AT.N), 4100.0))
            widths = np.diff(self.sfb_off)
            qmask = np.zeros((4, AT.N), np.float32)
            for b in range(len(widths)):
                lo, w = self.sfb_off[b], widths[b]
                k = w // 4
                for qq in range(4):
                    qmask[qq, lo + qq * k: lo + (qq + 1) * k] = 1.0
            curve = np.full(E.NB, 1e30, np.float32)
            curve[:len(widths)] = ref_power ** (widths / 32.0)
            width_ok = np.zeros(E.NB, bool)
            width_ok[:len(widths)] = widths >= 16   # minSfbWidth (long)
            self.pt["pns_tabs"] = {
                "qmask": jnp.asarray(qmask, dtype),
                "curve": jnp.asarray(curve, dtype),
                "width_ok": jnp.asarray(width_ok),
                # refTonality 0.10 (pnsInfoTab_lowComplexity rows 2-4):
                # noise-like iff energy-weighted chaos ratio > 10^-0.10
                "ton_thresh": jnp.asarray(10.0 ** -0.10, dtype),
            }
        # short-block context (block switching): grouped {4,4} band ladder
        self.max_sfb_short = int(np.searchsorted(
            self.sfb_off_short * rate / (2 * AT.NS), bw_hz)) - 1
        self.max_sfb_short = max(2, min(self.max_sfb_short, self.nsfb_short))
        nsfb, msfb = self.nsfb_short, self.max_sfb_short
        nbb = AT.N_GROUPS * nsfb
        idxs = np.arange(E.NB)
        band_m_s = AT.short_band_matrix(rate)
        pt_s_np = AT.short_band_psy_tables(rate)
        spr_s_np = AT.spread_energy_tables(rate, ch_bitrate, short=True)
        pt_short = {k: jnp.asarray(pt_s_np[k], dtype)
                    for k in ("f_low", "f_high", "ath", "pcm_floor")}
        pt_short["minsnr"] = jnp.asarray(
            AT.min_snr_ladder(ch_bitrate, rate, short=True), dtype)
        pt_short["f_low_spr"] = jnp.asarray(spr_s_np["f_low"], dtype)
        pt_short["f_high_spr"] = jnp.asarray(spr_s_np["f_high"], dtype)
        self.short_ctx = {
            "band_m": jnp.asarray(band_m_s, dtype),
            "bol": jnp.asarray(AT.short_band_of_line(rate)),
            "pt": pt_short,
            "bandsel": jnp.asarray((idxs < nbb) & (idxs % nsfb < msfb)),
            "force_break": jnp.asarray((idxs % nsfb == 0) & (idxs > 0)
                                       & (idxs < nbb)),
            "grp_start": jnp.asarray(idxs % nsfb == 0),
            "grp_end": jnp.asarray(idxs % nsfb == nsfb - 1),
            # pre-echo control over the grouped {4,4} ladder: swap map
            # between the two groups' band positions
            "prev_grp_map": jnp.asarray(
                np.where(idxs < nsfb, idxs + nsfb,
                         np.where(idxs < 2 * nsfb, idxs - nsfb, idxs))),
            "g1_mask": jnp.asarray(idxs < nsfb),
            "nbands_tx": AT.N_GROUPS * msfb,
            "nlines": jnp.asarray(np.maximum(band_m_s.sum(-1), 1.0), dtype),
        }
        # TNS static config: filter range [start line, stop line) and the
        # length code written in tns_data (decoder: StartBand = total - length,
        # stop clamped to min(total, tns_max_bands, max_sfb),
        # aacdec_tns.cpp:180-348 + tns_max_bands_tbl aac_rom.cpp:3179)
        _TNS_MAX = {96000: 31, 88200: 31, 64000: 34, 48000: 40, 44100: 42,
                    32000: 51, 24000: 46, 22050: 46, 16000: 42}
        total_sfb = self.nbands
        # LO filter start band (aacenc_tns.cpp:434-436): band 8 for
        # fs >= 18783, band 4 below - NOT a fixed frequency; the earlier
        # 1275 Hz derivation started one octave too high and cost the
        # whole low-mid range its temporal noise shaping
        start_band = 2 if rate < 9391 else (4 if rate < 18783 else 8)
        stop_band = min(total_sfb, _TNS_MAX.get(rate, 40), self.max_sfb)
        if stop_band - start_band >= 4:
            # split-range filters (aacenc_tns.cpp:439-445): the HI filter
            # starts at the LAST sfb border <= start + range/4, the LO
            # filter covers [start, mid)
            mid_target = (self.sfb_off[start_band]
                          + (self.sfb_off[stop_band]
                             - self.sfb_off[start_band]) // 4)
            mid_band = stop_band
            while mid_band > start_band + 1 and \
                    self.sfb_off[mid_band] > mid_target:
                mid_band -= 1
            self.tns_cfg = {
                "start_line": int(self.sfb_off[start_band]),
                "mid_line": int(self.sfb_off[mid_band]),
                "stop_line": int(self.sfb_off[stop_band]),
                "length_code": total_sfb - mid_band,
                "length_code_lo": mid_band - start_band,
                # single merged filter covers the whole TNS range
                # (aacenc_tns.cpp:937-939)
                "length_code_merged": total_sfb - start_band,
            }
        else:
            self.tns_cfg = None
        self.packer = SuperframePacker(cfg.subch, cfg.sample_rate,
                                       self.core_channels, sbr=self.is_sbr,
                                       ps=self.is_ps)
        payload = self.packer.payload_bits()
        # SBR payload bits are computed EXACTLY on device per AU
        # (sbr.payload_bits) and subtracted from that AU's budget in the
        # scan - no static worst-case reserve wasted (the reference also
        # rate-controls the core against the actual SBR payload)
        pad_bits = (cfg.pad_len + 3) * 8 if cfg.pad_len else 0
        base_au = payload // cfg.num_aus - pad_bits
        # Cross-superframe bit reservoir (FDKaacEnc_updateBitres,
        # aacenc.cpp:961-1000).  The DAB+ superframe is a HARD byte budget
        # (tpenc_dab.cpp:403), so bits cannot truly move across superframes
        # on the wire; a reservoir is implemented by *withholding* a slice of
        # every superframe's budget (which becomes FIL padding when unused)
        # that transient AUs in later superframes may draw on.  Worst case
        # per superframe = num_aus*budget_au + bitres_max <= payload.
        reserve_au = base_au // 16
        self.budget_au = base_au - reserve_au
        self.bitres_max = reserve_au * cfg.num_aus
        self.aupack_ctx = None
        if pack_on_device:
            from . import aupack
            self.aupack_ctx = aupack.AuPackCtx(self)
        self._step = jax.jit(self._superframe_step)

    def init_state(self):
        from . import blockswitch as BS
        st = {"prev": jnp.zeros((self.S, self.core_channels, AT.N), self.dtype),
              "pend": jnp.zeros((self.S, self.cfg.channels,
                                 self.cfg.au_samples), self.dtype),
              "bitres": jnp.zeros((self.S,), jnp.int32),
              # pre-echo control history (uncontrolled thresholds + the
              # skip flag cleared after START/first frames)
              "thr_nm1": jnp.full((self.S, self.core_channels, E.NB), 1e30,
                                  self.dtype),
              "pre_flag": jnp.zeros((self.S,), bool),
              # calcWeighting's per-channel lastEnFacPatch (adj_thr state)
              "wgt_last": jnp.zeros((self.S, self.core_channels), bool)}
        if self.is_sbr:
            st["ds_hist"] = jnp.zeros((self.S, self.core_channels,
                           self.ds_taps - 1), self.dtype)
            st["qmf_hist"] = jnp.zeros((self.S, self.core_channels, 576),
                                       self.dtype)
            st["sbr_hist"] = jnp.zeros((self.S, self.core_channels,
                                        SBR_SHIFT), self.dtype)
        if self.is_ps:
            st["ps_hist"] = jnp.zeros((self.S, 2, PS_SHIFT), self.dtype)
        st.update(BS.init_state(self.S, self.cfg.channels, self.dtype))
        return st

    def _superframe_step(self, state, pcm, pad_buf=None, pad_len=None,
                         thr_override=None):
        """pcm: [S, ch, num_aus*au_samples] int16 -> (state, outputs dict).
        pad_buf/pad_len: [S, nau, pad_max] int32 X-PAD bytes + used lengths
        (device-pack mode only; emitted as DSE ancillary data).

        The encoder carries one AU of delay (state["pend"]) so block
        switching has a true look-ahead granule, mirroring the reference's
        one-frame psychoacoustic delay (psy buffer in psy_main.cpp)."""
        from . import blockswitch as BS
        from . import sbr as SBR
        cfg = self.cfg
        S, ch, n = pcm.shape
        nau = cfg.num_aus
        x_new = pcm.astype(self.dtype)  # int16-scaled units

        # block-switching decisions: attacks measured on the UNDELAYED input
        # provide the look-ahead flags for the delayed (coded) granules
        wl = cfg.au_samples // 8
        wseq, state = BS.block_switch(x_new, state, wl, self.dtype)  # [nau, S]

        x = jnp.concatenate([state["pend"], x_new[..., :-cfg.au_samples]], -1)
        state = dict(state, pend=x_new[..., -cfg.au_samples:])

        sbr_out = {}
        if self.is_ps:
            # parametric stereo: IID from L/R, then mono downmix feeds SBR+core.
            # The decoder applies AU n's PS parameters over the same span its
            # SBR envelope covers (PS_SHIFT samples ahead of the coded AU,
            # see SBR_SHIFT), interpolating from the previous set across the
            # span; measure the stereo image over that application span.
            x_ps = jnp.concatenate([state["ps_hist"],
                                    x[..., :-PS_SHIFT]], -1)
            state = dict(state, ps_hist=x[..., -PS_SHIFT:])
            # PS_NENV envelopes per AU: the image is measured per
            # sub-window (the decoder interpolates between parameter sets)
            ne = self.ps_nenv
            sub = cfg.au_samples // ne
            aus_lr = x_ps.reshape(S, 2, nau, ne, sub).transpose(2, 0, 3, 1, 4)
            iid, icc, iid_fine, use_fine = SBR.iid_parameters(
                aus_lr[:, :, :, 0], aus_lr[:, :, :, 1], cfg.sample_rate,
                self.dtype)                            # [nau, S, ne, 20]
            if ne > 1:
                # static-image stabilisation: when the per-envelope IID
                # estimates agree within one step, transmit their mean in
                # every envelope - the decoder then holds the image instead
                # of interpolating through estimation jitter (the role of
                # fdk's parameter time-smoothing, ps_encode.cpp)
                def stab(v, tol):
                    # per band: estimation jitter collapses to the mean,
                    # true image motion (spread > tol) passes through
                    spread = v.max(-2, keepdims=True) - v.min(-2, keepdims=True)
                    mean = jnp.round(v.mean(-2, keepdims=True)).astype(v.dtype)
                    return jnp.where(spread <= tol,
                                     jnp.broadcast_to(mean, v.shape), v)
                iid = stab(iid, 1)
                iid_fine = stab(iid_fine, 2)
            sbr_out["ps_iid"] = jnp.moveaxis(iid, 0, 1)   # [S, nau, ne, 20]
            sbr_out["ps_icc"] = jnp.moveaxis(icc, 0, 1)
            sbr_out["ps_iid_fine"] = jnp.moveaxis(iid_fine, 0, 1)
            # one iid_mode per frame: fine when any envelope needs the range
            sbr_out["ps_fine"] = jnp.moveaxis(use_fine.any(-1), 0, 1)
            # energy-compensated mono downmix (correlation loss correction)
            m = 0.5 * (x[:, 0:1] + x[:, 1:2])
            e_lr = (x[:, 0:1] ** 2 + x[:, 1:2] ** 2).sum(-1, keepdims=True)
            e_m = (m ** 2).sum(-1, keepdims=True)
            g = jnp.clip(jnp.sqrt(0.5 * e_lr / jnp.maximum(e_m, 1e-3)),
                         1.0, 2.0)
            x = m * g
            ch = 1
        sbr_bits = jnp.zeros((S, nau), jnp.int32)
        if self.is_sbr:
            # analysis stream = coded stream delayed by SBR_SHIFT (see
            # constant above); sbr_hist carries the delayed tail across
            # superframes
            x_sbr = jnp.concatenate([state["sbr_hist"],
                                     x[..., :-SBR_SHIFT]], -1)
            state = dict(state, sbr_hist=x[..., -SBR_SHIFT:])
            # 64-band complex QMF analysis + envelope/noise/invf/add-harm
            # extraction (sbr.sbr_side_analysis), history carried in state
            side, qmf_hist = SBR.sbr_side_analysis(
                x_sbr, state["qmf_hist"], self.sbr_params, nau, self.dtype)
            if ch == 2:
                # stereo (non-PS) SBR: per-AU channel coupling when the
                # coupled coding is cheaper (bs_coupling, SBR_SWITCH_LRC)
                side = SBR.apply_coupling(side, self.sbr_params)
            sbr_out.update(side)
            state = dict(state, qmf_hist=qmf_hist)
            ps_bits = None
            if self.is_ps:
                ps_bits = SBR.ps_data_bits(
                    sbr_out["ps_iid"], sbr_out["ps_iid_fine"],
                    sbr_out["ps_fine"], sbr_out["ps_icc"])
            sbr_bits = SBR.payload_bits(side, self.sbr_params, nau,
                                        ps_bits=ps_bits)
            # 2:1 decimation for the core (half-band FIR, carried history)
            xx = jnp.concatenate([state["ds_hist"], x], axis=-1)
            # correlate: y[m] = sum_k h[k] * xx[2m + k]
            idx = 2 * np.arange(n // 2)[:, None] + \
                np.arange(self.ds_taps)[None, :]
            y = (xx[..., idx] * self.ds_filter).sum(-1)
            state = dict(state, ds_hist=xx[..., -(self.ds_taps - 1):])
            x = y  # core-rate signal [S, ch, n//2]

        grans = x.reshape(S, ch, nau, AT.N).transpose(2, 0, 1, 3)  # [nau,S,ch,960]
        prevs = jnp.concatenate([state["prev"][None], grans[:-1]], axis=0)

        max_sfb = jnp.full((S,), self.max_sfb, jnp.int32)
        nch = jnp.full((S,), self.core_channels, jnp.int32)

        # intra-superframe bit distribution by difficulty: the superframe is
        # a hard byte budget, so bits moved between its AUs are free (unlike
        # the cross-superframe reservoir, whose unused withholding burns as
        # FIL padding).  High-contrast AUs (attack/offset granules, where
        # quantisation noise is audible against the quiet span) get a larger
        # share - the role of fdk's PE-based bit allocation (adj_thr.cpp).
        se_au = (grans * grans).reshape(nau, S, ch, 8, AT.N // 8).sum(-1)
        se_prev = jnp.concatenate([
            (state["prev"] * state["prev"]).reshape(
                1, S, ch, 8, AT.N // 8).sum(-1), se_au[:-1]], axis=0)
        se_win = jnp.concatenate([se_prev, se_au], -1)  # coded window
        hard_au = (se_win.max(-1) > 32.0 * (se_win.min(-1) + 1.0)).any(-1)
        w = 1.0 + 0.5 * hard_au.astype(self.dtype)            # [nau,S]
        total = nau * self.budget_au - sbr_bits.T.sum(0)      # [S]
        budgets = (total * (w / w.sum(0))).astype(jnp.int32)  # [nau,S]

        have_pads = pad_buf is not None
        have_sbr_slots = self.aupack_ctx is not None and self.is_sbr

        def au_body(carry, xs):
            leftover, thr_nm1, pre_flag, wgt_last = carry
            prev, cur, seq, budget_au = \
                xs["prev"], xs["cur"], xs["seq"], xs["budget"]
            is_last = xs.get("is_last")
            pb, pl = xs.get("pb"), xs.get("pl")
            spec = E.mdct_frame_switched(prev, cur, self.cos_basis,
                                         self.wvecs, self.short_basis,
                                         seq, self.dtype)
            # time-domain transience over 16 sub-blocks of the WHOLE coded
            # window (prev+cur): the long MDCT window spans both granules,
            # so an offset (loud prev -> silent cur) smears this AU's
            # quantisation noise into the silence just like an attack does
            win = jnp.concatenate([prev, cur], -1)
            sub = win.reshape(win.shape[0], win.shape[1], 16, AT.N // 8)
            se = (sub * sub).sum(-1)
            transient = se.max(-1) > 6.0 * (se.mean(-1) + 1.0)
            # reservoir spending policy (bitres usage by demand,
            # aacenc.cpp:961-1000 spirit): ordinary AUs may only dip into a
            # quarter of the accumulated reservoir, high-contrast AUs
            # (attacks AND offsets - where long-window quantisation noise is
            # audible against the quiet span) drain it
            hard = (se.max(-1) > 32.0 * (se.min(-1) + 1.0)).any(-1)
            # cap the reservoir draw so one AU never exceeds budget_au +
            # (budget_au + bitres_max): the O_LO=0 banking policy can
            # accumulate several AUs' unspent budgets in `leftover`, and
            # an uncapped draw both exceeds the device content-buffer
            # bound (aupack maxcb soft term) and concentrates absurd bit
            # counts on one AU (fdk likewise caps per-frame bits)
            allow = jnp.where(hard, leftover, leftover // 4)
            allow = jnp.minimum(allow, self.budget_au + self.bitres_max)
            o = E.encode_au(spec, self.pt, self.band_m, self.bol,
                            max_sfb, budget_au + allow, nch, self.dtype,
                            tns_cfg=self.tns_cfg, transient=transient,
                            short_ctx=self.short_ctx, is_short=seq == 2,
                            refine_rounds=E.REFINE_ROUNDS
                            if cfg.afterburner else 0,
                            modify_minsnr=self.modify_minsnr,
                            pre_state=(thr_nm1, pre_flag), seq=seq,
                            weight_state=wgt_last,
                            thr_override=xs.get("thr_ov"))
            leftover = (jnp.maximum(budget_au + allow - o["bits"], 0)
                        + (leftover - allow)).astype(jnp.int32)
            o["wseq"] = seq
            if getattr(self, "debug_thr", False):
                # diagnostic tap (tools/diag_lc_thr.py): pre-loop psy
                # thresholds + band energies + spent bits per AU
                return (leftover, o["thr_nm1"], o["pre_flag"],
                        o["last_patch"]), \
                    {"thr": o["thr"], "en": o["en"], "bits": o["bits"],
                     "dist": o["dist"], "en_pre": o["en_pre"],
                     "minsnr": o["minsnr"],
                     "budget": budget_au + allow, "gains": o["gains"],
                     "books": o["books"], "q": o["q"],
                     "tns_en": o["tns_en"], "tns_order": o["tns_order"],
                     "tns_en_lo": o["tns_en_lo"],
                     "wseq": o["wseq"].astype(jnp.int8)}
            if self.aupack_ctx is not None:
                # pack the whole AU on device (aupack.py): the scan carries
                # only the content bytes + bit count + CRC reduction
                from . import aupack
                fr = {"q": o["q"], "gains": o["gains"], "books": o["books"],
                      "ms_used": o["ms_used"], "wseq": seq,
                      "tns_en": o["tns_en"], "tns_order": o["tns_order"],
                      "tns_idx": o["tns_idx"], "tns_en_lo": o["tns_en_lo"],
                      "tns_order_lo": o["tns_order_lo"],
                      "tns_idx_lo": o["tns_idx_lo"],
                      "tns_len": o["tns_len"]}
                sbr_group = None
                if "sbr_w" in xs:
                    sbr_group = (xs["sbr_w"], xs["sbr_v"], 4)
                groups = aupack.au_content_groups(
                    self.aupack_ctx, fr, is_last, pad_buf=pb, pad_len=pl,
                    sbr_group=sbr_group)
                aubuf, abits, c1 = aupack.pack_au_content(
                    self.aupack_ctx, groups)
                return (leftover, o["thr_nm1"], o["pre_flag"],
                        o["last_patch"]), \
                    {"aubuf": aubuf.astype(jnp.uint8),
                     "au_bits": abits, "crc_part": c1}
            # minimal dtypes: device->host transfer is on the critical path
            # (q <= 8191, gains/noise-nrg in [-100, 155], books <= 15,
            # TNS indices 4-bit); the host packer widens as needed
            return (leftover, o["thr_nm1"], o["pre_flag"],
                    o["last_patch"]), \
                {"q": o["q"].astype(jnp.int16),
                 "gains": o["gains"].astype(jnp.int16),
                 "books": o["books"].astype(jnp.uint8),
                 "bits": o["bits"],
                 "ms_used": o["ms_used"],
                 "tns_en": o["tns_en"],
                 "tns_order": o["tns_order"].astype(jnp.int8),
                 "tns_idx": o["tns_idx"].astype(jnp.int8),
                 "tns_en_lo": o["tns_en_lo"],
                 "tns_order_lo": o["tns_order_lo"].astype(jnp.int8),
                 "tns_idx_lo": o["tns_idx_lo"].astype(jnp.int8),
                 "tns_len": o["tns_len"].astype(jnp.int8),
                 "wseq": o["wseq"].astype(jnp.int8)}

        bitres0 = jnp.minimum(state["bitres"], self.bitres_max)
        xs = {"prev": prevs, "cur": grans, "seq": wseq, "budget": budgets,
              "is_last": jnp.arange(nau) == nau - 1}
        if thr_override is not None:
            xs["thr_ov"] = jnp.moveaxis(thr_override, 0, 1)  # [nau,S,ch,NB]
        if have_pads:
            xs["pb"] = jnp.moveaxis(pad_buf, 0, 1)
            xs["pl"] = jnp.moveaxis(pad_len, 0, 1)
        if have_sbr_slots:
            from . import aupack
            sw, sv = aupack.sbr_slot_groups(self, sbr_out)
            xs["sbr_w"] = jnp.moveaxis(sw, 0, 1)
            xs["sbr_v"] = jnp.moveaxis(sv, 0, 1)
        (bitres, thr_nm1, pre_flag, wgt_last), out = jax.lax.scan(
            au_body, (bitres0, state["thr_nm1"], state["pre_flag"],
                      state["wgt_last"]), xs)
        out = {k: jnp.moveaxis(v, 0, 1) for k, v in out.items()}  # [S,nau,...]
        out.update(sbr_out)
        if self.aupack_ctx is not None:
            from . import aupack
            sf, lens = aupack.assemble_superframes(
                self.aupack_ctx, out["aubuf"].astype(jnp.int32),
                out["au_bits"], out["crc_part"])
            # ONE output leaf (the tunnel costs ~9 ms per transfer
            # regardless of size): superframe bytes | au_len u16le | au_bits
            # u16le, [S, total(+parity) + 4*nau] uint8
            ab = out["au_bits"]
            tail = jnp.concatenate(
                [lens & 0xFF, (lens >> 8) & 0xFF,
                 ab & 0xFF, (ab >> 8) & 0xFF], axis=1).astype(jnp.uint8)
            out = {"wire": jnp.concatenate([sf, tail], axis=1)}
        new_state = dict(state, prev=grans[-1],
                         bitres=jnp.minimum(bitres, self.bitres_max),
                         thr_nm1=thr_nm1, pre_flag=pre_flag,
                         wgt_last=wgt_last)
        return new_state, out

    def take_state(self, state, idx):
        """Per-stream state rows for churn (all leaves are [S, ...])."""
        idx = np.asarray(idx)
        return jax.tree_util.tree_map(lambda a: a[idx], state)

    def put_state(self, state, idx, rows):
        idx = np.asarray(idx)
        return jax.tree_util.tree_map(lambda a, r: a.at[idx].set(r),
                                      state, rows)

    def encode_superframes(self, state, pcm, add_rs=True, pads=None,
                           pack=True, thr_override=None):
        """pcm: [S, ch, num_aus*au_samples] int16; pads: optional
        [S][num_aus] list of X-PAD byte strings (sent as DSE ancillary data,
        like IN_ANCILLRY_DATA in the reference).
        Returns (state, [S] list of superframe bytes); with pack=False the
        second element is the raw device output dict (still unsynchronised -
        pass to pack_superframes later, so the host can pipeline packing
        against the next device step)."""
        if self.aupack_ctx is not None:
            args = ()
            if self.cfg.pad_len:
                pb = np.zeros((self.S, self.cfg.num_aus, self.cfg.pad_len),
                              np.int32)
                pl = np.zeros((self.S, self.cfg.num_aus), np.int32)
                if pads is not None:
                    for s in range(self.S):
                        for a, p in enumerate(pads[s]):
                            if p:
                                pb[s, a, :len(p)] = np.frombuffer(p, np.uint8)
                                pl[s, a] = len(p)
                args = (jnp.asarray(pb), jnp.asarray(pl))
            kw = {} if thr_override is None else \
                {"thr_override": jnp.asarray(thr_override)}
            state, out = self._step(state, jnp.asarray(pcm), *args, **kw)
        else:
            kw = {} if thr_override is None else \
                {"thr_override": jnp.asarray(thr_override)}
            state, out = self._step(state, jnp.asarray(pcm), **kw)
        if not pack:
            self._pack_args = (add_rs, pads)
            return state, out
        return state, self.pack_superframes(out, add_rs=add_rs, pads=pads)

    def pack_superframes(self, out, add_rs=None, pads=None, use_native=True):
        """Host half of encode_superframes (AU syntax + superframe + RS).
        Uses the C++ batch packer (native/dabpack.cpp) when available; the
        Python writer below is the validation fallback."""
        from . import sbr as SBR
        if add_rs is None:
            add_rs, pads = getattr(self, "_pack_args", (True, None))
        out = {k: np.asarray(v) for k, v in out.items()}
        if "wire" in out:
            # device-packed superframes (single buffer, see
            # _superframe_step): slice rows; core only when !add_rs
            nau = self.cfg.num_aus
            w = out["wire"]
            t = w[:, -4 * nau:].astype(np.int32)
            ab = t[:, 2 * nau:3 * nau] | (t[:, 3 * nau:] << 8)
            if (ab > 8 * self.aupack_ctx.maxcb).any():
                # should be unreachable: the rate loop's crash recovery
                # (encode.py _recover) degrades an overflowing stream's AU
                # to fit.  If it ever fires, that stream's superframe is
                # corrupt (the decoder drops it via AU CRC) - warn and keep
                # the batch alive rather than aborting all streams.
                import sys
                bad = np.flatnonzero((ab > 8 * self.aupack_ctx.maxcb)
                                     .any(axis=1))
                print(f"dabplus: AU content exceeds the device pack bound "
                      f"({8 * self.aupack_ctx.maxcb} bits) on streams "
                      f"{bad.tolist()} - emitting corrupt superframes for "
                      f"those streams", file=sys.stderr)
            n = self.packer.total if not add_rs else w.shape[1] - 4 * nau
            return [w[s, :n].tobytes() for s in range(self.S)]
        if use_native:
            from ..host import native
            frames = native.dabplus_pack_batch(self, out, pads, add_rs)
            if frames is not None:
                return frames
        short_info = {"nsfb": self.nsfb_short, "max_sfb": self.max_sfb_short,
                      "sfb_off": self.sfb_off_short}
        frames = []
        for s in range(self.S):
            aus = []
            for a in range(self.cfg.num_aus):
                tns = None
                if self.tns_cfg is not None:
                    tns = [(bool(out["tns_en"][s, a, c]),
                            int(out["tns_order"][s, a, c]),
                            out["tns_idx"][s, a, c],
                            int(out["tns_len"][s, a, c]),
                            bool(out["tns_en_lo"][s, a, c]),
                            int(out["tns_order_lo"][s, a, c]),
                            out["tns_idx_lo"][s, a, c],
                            self.tns_cfg["length_code_lo"])
                           for c in range(self.core_channels)]
                bw = write_au(out["q"][s, a], out["gains"][s, a],
                              out["books"][s, a], self.max_sfb,
                              self.sfb_off, self.core_channels,
                              ms_used=out["ms_used"][s, a], tns=tns,
                              wseq=int(out["wseq"][s, a]),
                              short_info=short_info)
                if pads is not None and pads[s][a]:
                    from ..host.aacpack import write_dse
                    write_dse(bw, pads[s][a])
                if self.is_sbr:
                    env = out["sbr_env"][s, a]
                    env2 = out["sbr_env2"][s, a]
                    tr = out["sbr_transient"][s, a]
                    nq = out["sbr_noise_q"][s, a]
                    invf = out["sbr_invf"][s, a]
                    ah = out["sbr_addharm"][s, a]
                    tg = out["sbr_tgrid"][s, a]
                    stereo = self.core_channels == 2

                    def _envs(c):
                        # transient AUs: 2-envelope grid at 3.0 dB; else one
                        # envelope at 1.5 dB (decoder amp-res contract)
                        return [env2[c, 0], env2[c, 1]] if tr[c] else [env[c]]
                    SBR.write_sbr_payload(
                        bw, _envs(0), noise_vals=nq[0],
                        params=self.sbr_params,
                        write_header=(a == 0),
                        ps_iid=(out["ps_iid_fine"][s, a]
                                if out["ps_fine"][s, a] else
                                out["ps_iid"][s, a]) if self.is_ps else None,
                        ps_icc=out["ps_icc"][s, a] if self.is_ps else None,
                        ps_fine=bool(out["ps_fine"][s, a]) if self.is_ps else False,
                        envs_r=_envs(1) if stereo else None,
                        invf=invf[0],
                        invf_r=invf[1] if stereo else None,
                        noise_vals_r=nq[1] if stereo else None,
                        add_harm=ah[0],
                        add_harm_r=ah[1] if stereo else None,
                        grid_idx=int(tg[0]) if tr[0] else None,
                        grid_idx_r=(int(tg[1]) if tr[1] else None)
                        if stereo else None,
                        coupled=bool(out["sbr_cpl"][s, a])
                        if stereo and "sbr_cpl" in out else False)
                aus.append(bw)
            frames.append(self.packer.assemble(aus, add_rs=add_rs))
        return frames
