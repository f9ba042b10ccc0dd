"""End-to-end bit-exactness: our batched encoder vs reference golden streams."""
import json
from pathlib import Path

import numpy as np
import pytest

from odr_audioenc_tpu.mp2.model import Mp2Encoder, make_config
from odr_audioenc_tpu.host.mp2pack import Mp2Packer
from odr_audioenc_tpu.host import mp2parse

import gen_golden

GOLDEN = Path(__file__).parent / "golden"


def run_config(name, max_frames=None):
    signame, nf, rate, bitrate, mode, psy, xpad_len = gen_golden.CONFIGS[name]
    frames, xpads = gen_golden.make_input(name)
    if max_frames:
        frames = frames[:max_frames]
    cfg = make_config([{"rate": rate, "bitrate": bitrate, "mode": mode,
                        "pad_len": xpad_len}])
    enc = Mp2Encoder(cfg, psy_model=psy)
    packer = Mp2Packer(cfg)
    state = enc.init_state()
    chunks = []
    for fi, f in enumerate(frames):
        xl = np.array([xpad_len], np.int32)
        state, out = enc.encode_step(state, f[None], xl)
        out_np = {k: np.asarray(v) for k, v in out.items()}
        xp = [xpads[fi]] if xpads else None
        chunks += packer.emit(out_np, xp)
    chunks += packer.finish()
    return b"".join(chunks)


def compare_streams(got, want, name):
    if got == want:
        return
    gf = mp2parse.split_frames(got)
    wf = mp2parse.split_frames(want)
    n_bad = sum(1 for a, b in zip(gf, wf) if a != b)
    msgs = [f"{name}: {n_bad}/{min(len(gf), len(wf))} frames differ "
            f"(lengths {len(got)} vs {len(want)})"]
    for i, (a, b) in enumerate(zip(gf, wf)):
        if a != b:
            pa, pb = mp2parse.parse_frame(a), mp2parse.parse_frame(b)
            for key in ["header", "bit_alloc", "scfsi", "sf", "samples"]:
                va, vb = pa[key], pb[key]
                eq = va == vb if key == "header" else np.array_equal(va, vb)
                if not eq:
                    msgs.append(f"frame {i}: first divergence in {key}")
                    if key != "header":
                        idx = np.argwhere(va != vb)[:4]
                        msgs.append(f"  at {idx.tolist()}: got "
                                    f"{[va[tuple(k)] for k in idx]} want "
                                    f"{[vb[tuple(k)] for k in idx]}")
                    break
            else:
                msgs.append(f"frame {i}: differs only in scf-crc/fpad bytes")
            break
    pytest.fail("\n".join(msgs))


@pytest.mark.parametrize("name", list(gen_golden.CONFIGS))
def test_golden(name):
    want = (GOLDEN / f"{name}.mp2").read_bytes()
    got = run_config(name)
    compare_streams(got, want, name)
