"""Batched multi-station runtime: the framework's north-star operating mode.

Takes a JSON config listing stations and runs them as device batches - MP2
streams with mixed bitrates/modes share one jitted encode step per sample
rate; DAB+ streams are grouped by (rate, bitrate, channels).  Each station has
its own input file and outputs/stats, mirroring what N reference processes
would do.

Config:
{
  "realtime": false,
  "streams": [
    {"codec": "mp2", "input": "a.wav", "format": "wav", "rate": 48000,
     "bitrate": 128, "mode": "j", "output": "a.mp2", "stats": "/tmp/a.stats"},
    {"codec": "dabplus", "input": "b.wav", "rate": 48000, "bitrate": 96,
     "channels": 2, "output": "b.dabp",
     "edi": ["udp://127.0.0.1:12002"], "edi_fec": 2,
     "zmq": "tcp://*:9001", "secret_key": null,
     "pad": "/tmp/b.pad", "pad_len": 58}
  ]
}

Per-station sinks mirror the single-encoder CLI (odr-audioenc.cpp
send path, src/odr-audioenc.cpp:1282-1322): "output" file, "zmq" PUB
(optionally CURVE-encrypted with "secret_key"), "edi" destination list
("edi_fec" enables PFT), and a "pad"/"pad_len" ODR-PadEnc socket polled
once per MP2 frame / DAB+ AU.
"""
import sys
import time
from collections import defaultdict

import numpy as np


class _Station:
    def __init__(self, conf):
        from .io.inputs import FileInput
        from .outputs import FileOutput, ZmqOutput, EdiOutput
        from .outputs.edi_out import EdiConfig, EdiDestination
        from .host.sidecars import StatsPublisher, PadInterface
        self.conf = conf
        self.codec = conf.get("codec", "dabplus")
        self.rate = conf.get("rate", 48000)
        self.bitrate = conf.get("bitrate", 96 if self.codec == "dabplus" else 128)
        self.mode = conf.get("mode", "j")
        self.channels = conf.get("channels", 1 if self.mode == "m" else 2)
        if self.codec == "mp2" and self.channels == 1:
            self.mode = "m"
        # AOT auto-selection by bitrate/channels (prepare_aac_encoder,
        # odr-audioenc.cpp:249-261), overridable with an "aot" key
        subch = self.bitrate // 8
        if self.codec == "dabplus":
            if self.channels == 2 and subch <= 6:
                auto = "ps"
            elif (self.channels == 1 and subch <= 8) or \
                    (self.channels == 2 and subch <= 10):
                auto = "sbr"
            else:
                auto = "lc"
            self.aot = conf.get("aot", auto)
        else:
            self.aot = None
        from .io.queue import SampleQueue
        self.queue = SampleQueue()
        self.queue.configure(1 << 24, push_block=False, channels=self.channels)
        self.input = FileInput(self.queue, conf["input"],
                               conf.get("format", "wav") == "raw",
                               self.rate, self.channels,
                               conf.get("fifo_silence", False))
        self.input.prepare()
        self.output = FileOutput(conf["output"]) if "output" in conf else None
        # per-station ZMQ PUB (Outputs.cpp ZMQ path; one encoder = one PUB)
        self.zmq = None
        if conf.get("zmq"):
            self.zmq = ZmqOutput(conf["zmq"], conf.get("secret_key"))
            self.zmq.set_encoder_type(self.codec == "dabplus")
        # per-station EDI sender (odr-audioenc.cpp:1282-1322 send path)
        self.edi = None
        if conf.get("edi"):
            uris = conf["edi"]
            if isinstance(uris, str):
                uris = [uris]
            dests = []
            for uri in uris:
                proto, rest = uri.split("://", 1)
                host, port = rest.rsplit(":", 1)
                dests.append(EdiDestination(proto, host, int(port)))
            fec = int(conf.get("edi_fec", 0))
            self.edi = EdiOutput(
                EdiConfig(enable_pft=fec > 0, fec=fec, destinations=dests),
                tist=bool(conf.get("edi_tist", False)),
                delay_ms=int(conf.get("edi_delay_ms", 0)),
                tai_offset=conf.get("edi_tai_offset"))
        # per-station PAD socket (PadInterface; one request per MP2 frame /
        # per DAB+ AU, mirroring the CLI loop)
        self.pad_len = int(conf.get("pad_len", 0)) if conf.get("pad") else 0
        self.pad = None
        if self.pad_len:
            self.pad = PadInterface()
            self.pad.open(conf["pad"])
        self.stats = StatsPublisher(conf["stats"]) if conf.get("stats") else None
        self.eof = False
        self.mp2_fifo = b""
        self.frames_done = 0

    def request_pads(self, n):
        """n PAD requests.  DAB+: list of n trimmed X-PAD byte strings
        (possibly empty).  MP2: list of n (full_buffer, used_len) tuples
        as Mp2Packer.emit expects."""
        out = []
        for _ in range(n):
            data = self.pad.request(self.pad_len)
            cl = 0
            xpad = b""
            if len(data) == self.pad_len + 1 and data[self.pad_len] >= 2:
                cl = data[self.pad_len]
                xpad = data[:self.pad_len]
                # AAC: skip PAD if only zero F-PAD (TS 102 563 5.4.3)
                if self.codec == "dabplus" and cl == 2 and \
                        xpad[-2] == 0 and xpad[-1] == 0:
                    cl = 0
            if self.codec == "dabplus":
                out.append(xpad[self.pad_len - cl:] if cl else b"")
            else:
                out.append((xpad, cl) if cl else (b"", 0))
        return out

    def send(self, buf, peak):
        """Route one coded frame to every configured sink."""
        if self.output:
            self.output.write_frame(buf)
        if self.zmq:
            self.zmq.update_audio_levels(peak, peak)
            self.zmq.write_frame(buf)
        if self.edi:
            self.edi.update_audio_levels(peak, peak)
            if self.codec == "dabplus":
                bs = len(buf) // 5   # 5 x 24 ms EDI frames per superframe
                for i in range(5):
                    self.edi.write_frame(buf[i * bs:(i + 1) * bs])
            else:
                self.edi.write_frame(buf)

    def close(self):
        for o in (self.output, self.zmq, self.edi):
            if o is not None:
                o.close()
        if self.pad:
            self.pad.close()

    def read_frame(self, nsamples):
        nbytes = nsamples * self.channels * 2
        if not self.eof and not self.input.read_source(nbytes):
            self.eof = True
        buf, _, _ = self.queue.pop(nbytes)  # zero-fills past EOF
        pcm = np.frombuffer(buf, np.int16).reshape(-1, self.channels).T
        return pcm

    def publish(self, peak_l, peak_r):
        if self.stats:
            self.stats.update_audio_levels(peak_l, peak_r)
            self.stats.send_stats()


def run_fleet(conf, verbose=0):
    import jax.numpy as jnp
    from .mp2.model import Mp2Encoder, make_config
    from .host.mp2pack import Mp2Packer
    from .dabplus.model import DabPlusEncoder, DabPlusConfig

    stations = [_Station(s) for s in conf["streams"]]
    realtime = conf.get("realtime", False)
    groups = defaultdict(list)
    for st in stations:
        if st.codec == "mp2":
            groups[("mp2", st.rate)].append(st)
        else:
            groups[("dabplus", st.rate, st.bitrate, st.channels,
                    st.pad_len, st.aot)].append(st)

    runners = []
    for key, members in groups.items():
        if key[0] == "mp2":
            cfg = make_config([{"rate": m.rate, "bitrate": m.bitrate,
                                "mode": m.mode, "pad_len": m.pad_len}
                               for m in members])
            enc = Mp2Encoder(cfg, psy_model=1, dtype=jnp.float32,
                             pack_on_device="frame")
            packer = Mp2Packer(cfg)
            runners.append(("mp2", members, enc, packer, enc.init_state()))
        else:
            _, rate, bitrate, ch, pad_len, aot = key
            dcfg = DabPlusConfig(rate, bitrate // 8, ch, pad_len=pad_len,
                                 aot=aot)
            enc = DabPlusEncoder(dcfg, n_streams=len(members),
                                 pack_on_device=True)
            runners.append(("dabplus", members, enc, None, enc.init_state()))

    t0 = time.perf_counter()
    audio_seconds = 0.0
    first_pass = True
    # one-step-deep host<->device pipeline: the device computes step k while
    # the host transfers + bit-packs step k-1's outputs (JAX dispatch is
    # async; np.asarray is the sync point, so it runs AFTER the next step
    # has been submitted)
    pending = [None] * len(runners)

    def drain(ri):
        kind, members, enc, packer, _ = runners[ri]
        if pending[ri] is None:
            return
        out_dev, pcm, xp = pending[ri]
        pending[ri] = None
        if kind == "mp2":
            out_np = {k: np.asarray(v) for k, v in out_dev.items()}
            chunks = packer.emit(out_np, xp)
            for i, m in enumerate(members):
                m.mp2_fifo += chunks[i]
                fl = 3 * m.bitrate
                peak = int(np.abs(pcm[i].astype(np.int32)).max())
                while len(m.mp2_fifo) >= fl:
                    m.send(m.mp2_fifo[:fl], peak)
                    m.mp2_fifo = m.mp2_fifo[fl:]
                m.publish(peak, peak)
                m.frames_done += 1
        else:
            frames = enc.pack_superframes(out_dev) \
                if hasattr(enc, "pack_superframes") else out_dev
            for i, m in enumerate(members):
                peak = int(np.abs(pcm[i].astype(np.int32)).max())
                m.send(frames[i], peak)
                m.publish(peak, peak)
                m.frames_done += 1

    while True:
        all_eof = all(m.eof for _, members, *_ in runners for m in members)
        if all_eof:
            break
        for ri, (kind, members, enc, packer, state) in enumerate(runners):
            if all(m.eof for m in members):
                drain(ri)
                continue
            if kind == "mp2":
                pcm = np.zeros((len(members), 2, 1152), np.int16)
                xp = [None] * len(members)
                xl = np.zeros((len(members),), np.int32)
                for i, m in enumerate(members):
                    p = m.read_frame(1152)
                    pcm[i, :m.channels] = p
                    if m.channels == 1:
                        pcm[i, 1] = p[0]
                    if m.pad:
                        xp[i] = m.request_pads(1)[0]
                        xl[i] = xp[i][1]
                have_pads = any(x is not None for x in xp)
                xbuf = None
                if have_pads:
                    # frame mode packs X-PAD on device: [S, pad_max] buffers
                    xbuf = np.zeros((len(members), enc.pad_max), np.int32)
                    for i, x in enumerate(xp):
                        if x is not None and x[0]:
                            b = np.frombuffer(x[0], np.uint8)
                            xbuf[i, :len(b)] = b
                state, out = enc.encode_step(
                    state, pcm, xl if have_pads else None,
                    xpad_buf=xbuf)  # async dispatch
                audio_seconds += len(members) * 1152 / members[0].rate
                step_xp = xp if have_pads else None
            else:
                nau = enc.cfg.num_aus
                # SBR/PS AUs cover 1920 full-rate samples (au_samples), LC 960
                nsamp = nau * enc.cfg.au_samples
                pcm = np.zeros((len(members), enc.cfg.channels, nsamp), np.int16)
                pads = []
                for i, m in enumerate(members):
                    pcm[i] = m.read_frame(nsamp)[:enc.cfg.channels]
                    pads.append(m.request_pads(nau) if m.pad else [b""] * nau)
                have_pads = any(m.pad for m in members)
                state, out = enc.encode_superframes(
                    state, pcm, pack=False,
                    pads=pads if have_pads else None)
                audio_seconds += len(members) * nsamp / members[0].rate
                step_xp = None
            # start the device->host copies now so the transfer overlaps the
            # other runners' dispatches and this runner's next-step compute
            for v in out.values():
                f = getattr(v, "copy_to_host_async", None)
                if f is not None:
                    try:
                        f()
                    except Exception:
                        pass
            prev = pending[ri]
            pending[ri] = (out, pcm, step_xp)
            runners[ri] = (kind, members, enc, packer, state)
            if prev is not None:
                pending[ri], keep = prev, pending[ri]
                drain(ri)
                pending[ri] = keep
        if first_pass:
            # steady-state rate: exclude the first pass (jit compilation)
            first_pass = False
            t0 = time.perf_counter()
            audio_seconds = 0.0
        if realtime:
            time.sleep(0.001)
    for ri in range(len(runners)):
        drain(ri)

    dt = time.perf_counter() - t0
    for st in stations:
        st.close()
    rate = audio_seconds / dt if dt > 0 else 0.0
    print(f"fleet: {len(stations)} stations, {audio_seconds:.1f} audio-s "
          f"in {dt:.2f} s wall = {rate:.1f} streams*realtime",
          file=sys.stderr)
    return rate
