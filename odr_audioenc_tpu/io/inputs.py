"""Input layer (src/InputInterface.h contract + FileInput; live-capture inputs
are stubbed in this build since libasound/libjack/libvlc/gstreamer are not
present - they raise with a clear message, mirroring the reference's compile-
time gating of HAVE_ALSA/HAVE_JACK/HAVE_VLC/HAVE_GST)."""
import sys

from .wav import WavReader


class InputInterface:
    """src/InputInterface.h:28-53."""

    def prepare(self):
        raise NotImplementedError

    def fault_detected(self):
        return False

    def read_source(self, size_bytes):
        """Returns False on EOF."""
        raise NotImplementedError


class FileInput(InputInterface):
    """WAV/raw file or stdin (src/FileInput.cpp).  Samples land in `queue`
    (a bytearray here - the batch runtime pulls full frames)."""

    def __init__(self, filename, raw_input, sample_rate, channels,
                 continue_after_eof=False):
        self.filename = filename
        self.raw = raw_input
        self.rate = sample_rate
        self.channels = channels
        self.continue_after_eof = continue_after_eof
        self.queue = bytearray()
        self.eof = False
        self.wav = None
        self.f = None

    def prepare(self):
        if self.filename == "-":
            self.f = sys.stdin.buffer
        else:
            self.f = open(self.filename, "rb")
        if not self.raw:
            self.wav = WavReader(self.f)
            if self.wav.rate != self.rate:
                raise RuntimeError(
                    f"WAV sample rate {self.wav.rate} != configured {self.rate}")
            if self.wav.channels != self.channels:
                raise RuntimeError(
                    f"WAV channels {self.wav.channels} != configured {self.channels}")

    def read_source(self, size_bytes):
        src = self.wav if self.wav else self.f
        buf = src.read(size_bytes)
        if not buf:
            if self.continue_after_eof:
                self.queue += bytes(size_bytes)  # --fifo-silence
                return True
            self.eof = True
            return False
        self.queue += buf
        if len(buf) < size_bytes and not self.continue_after_eof:
            # partial final read: zero-pad to keep frame alignment
            self.queue += bytes(size_bytes - len(buf))
        return True


def make_unavailable(name, flag):
    class Unavailable(InputInterface):
        def __init__(self, *a, **k):
            raise RuntimeError(
                f"{name} input requires {flag}, which is not available in "
                f"this environment (matches the reference's compile-time gate)")
    return Unavailable


AlsaInput = make_unavailable("ALSA", "libasound")
JackInput = make_unavailable("JACK", "libjack")
VLCInput = make_unavailable("VLC", "libvlc")
GSTInput = make_unavailable("GStreamer", "gstreamer-1.0")
