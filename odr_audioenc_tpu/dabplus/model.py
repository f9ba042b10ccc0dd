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


@dataclass
class DabPlusConfig:
    sample_rate: int
    subch: int           # subchannel index = bitrate / 8000
    channels: int

    @property
    def num_aus(self):
        return self.sample_rate // 8000

    @property
    def bitrate(self):
        return self.subch * 8000


class DabPlusEncoder:
    """One instance per homogeneous stream batch (same rate/channels/bitrate;
    mixed batches can use several instances or padding)."""

    def __init__(self, cfg: DabPlusConfig, n_streams=1, dtype=jnp.float32):
        self.cfg = cfg
        self.S = n_streams
        self.dtype = dtype
        rate = cfg.sample_rate
        self.basis = jnp.asarray(AT.mdct_matrix(), dtype)
        self.band_m = jnp.asarray(AT.band_matrix(rate), dtype)
        self.bol = jnp.asarray(AT.band_of_line(rate))
        pt_np = AT.band_psy_tables(rate)
        self.pt = {k: jnp.asarray(v, dtype) for k, v in pt_np.items() if k != "nbands"}
        self.nbands = pt_np["nbands"]
        self.sfb_off = AT.sfb_offsets(rate)
        # bandwidth limit by per-channel bitrate (bandwidth.cpp analogue)
        br_per_ch = cfg.bitrate / cfg.channels
        bw_hz = min(rate * 0.5 * 0.92, 2800.0 + br_per_ch * 0.18)
        self.max_sfb = int(np.searchsorted(self.sfb_off * rate / (2 * AT.N), bw_hz)) - 1
        self.max_sfb = max(4, min(self.max_sfb, self.nbands))
        self.packer = SuperframePacker(cfg.subch, rate, cfg.channels)
        payload = self.packer.payload_bits()
        self.budget_au = payload // cfg.num_aus
        self._step = jax.jit(self._superframe_step)

    def init_state(self):
        return {"prev": jnp.zeros((self.S, self.cfg.channels, AT.N), self.dtype)}

    def _superframe_step(self, state, pcm):
        """pcm: [S, ch, num_aus*960] int16 -> (state, outputs dict)."""
        cfg = self.cfg
        S, ch, n = pcm.shape
        nau = cfg.num_aus
        x = pcm.astype(self.dtype)  # int16-scaled units
        grans = x.reshape(S, ch, nau, AT.N).transpose(2, 0, 1, 3)  # [nau,S,ch,960]
        prevs = jnp.concatenate([state["prev"][None], grans[:-1]], axis=0)

        max_sfb = jnp.full((S,), self.max_sfb, jnp.int32)
        budget = jnp.full((S,), self.budget_au, jnp.int32)
        nch = jnp.full((S,), ch, jnp.int32)

        def au_body(carry, xs):
            leftover = carry
            prev, cur = xs
            spec = E.mdct_frame(prev, cur, self.basis, self.dtype)
            o = E.encode_au(spec, self.pt, self.band_m, self.bol,
                            max_sfb, budget + leftover, nch, self.dtype)
            leftover = jnp.maximum(budget + leftover - o["bits"], 0).astype(jnp.int32)
            return leftover, {k: o[k] for k in
                              ["q", "gains", "books", "bits", "ms_used"]}

        _, out = jax.lax.scan(au_body, jnp.zeros((S,), jnp.int32), (prevs, grans))
        out = {k: jnp.moveaxis(v, 0, 1) for k, v in out.items()}  # [S,nau,...]
        return {"prev": grans[-1]}, out

    def encode_superframes(self, state, pcm, add_rs=True):
        """pcm: [S, ch, num_aus*960] int16.
        Returns (state, [S] list of superframe bytes)."""
        state, out = self._step(state, jnp.asarray(pcm))
        out = {k: np.asarray(v) for k, v in out.items()}
        frames = []
        for s in range(self.S):
            aus = []
            for a in range(self.cfg.num_aus):
                aus.append(write_au(out["q"][s, a], out["gains"][s, a],
                                    out["books"][s, a], self.max_sfb,
                                    self.sfb_off, self.cfg.channels,
                                    ms_used=out["ms_used"][s, a]))
            frames.append(self.packer.assemble(aus, add_rs=add_rs))
        return state, frames
