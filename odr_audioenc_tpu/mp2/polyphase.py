"""Batched 32-band polyphase analysis filterbank.

Equivalent to libtoolame-dab/subband.c:201-310 (WindowFilterSubband), but
re-expressed stream-batched: instead of 36 sequential calls per frame per
channel on a strided ring buffer, we materialise all 36 sliding windows of the
time-reversed sample stream and reduce them with two dense contractions that
map onto the TPU MXU:

    u[b, t, m]   = reversed 512-window ending at block t        (gather)
    y[b, t, i]   = sum_j u[t, i + 64j] * C[i + 64j]             (windowing)
    yp[b, t, k]  = fold of y per Chen's DCT prep
    s[b, t, sb]  = yp @ D^T                                     (16x32 DCT)

The DCT coefficients carry the reference's 1e-9 decimal rounding so the f64
path reproduces toolame bit-for-bit.
"""
import jax.numpy as jnp
import numpy as np

from .. import tables as T

# gather index matrix: window m of block t reads x[511 + 32 t - m] from the
# concat(hist[480], frame[1152]) buffer (x reversed-in-time indexing).
_IDX = (511 + 32 * np.arange(36)[:, None] - np.arange(512)[None, :]).astype(np.int32)


def polyphase_frame(hist, frame, dtype=jnp.float64, exact_order=None):
    """hist: [..., 480] previous samples (float, already /32768).
    frame: [..., 1152] current samples (float).
    Returns (sb_sample [..., 36, 32], new_hist [..., 480]).

    The leading dims are arbitrary batch dims (e.g. [S, nch]).

    exact_order=True replicates the C accumulation order bit-for-bit (used by
    the f64 validation path); False uses dense reductions/matmuls that map
    better onto the MXU (the f32 TPU throughput path).  Defaults to True for
    float64 inputs.
    """
    if exact_order is None:
        exact_order = jnp.dtype(dtype) == jnp.float64
    x = jnp.concatenate([hist, frame], axis=-1)
    u = x[..., _IDX]  # [..., 36, 512]
    z = u * jnp.asarray(T.ENWINDOW, dtype)
    z8 = z.reshape(*z.shape[:-1], 8, 64)

    if exact_order:
        # t = d0*e0; t += d1*e1; ... (subband.c:249-257, sequential over j)
        y = z8[..., 0, :]
        for j in range(1, 8):
            y = y + z8[..., j, :]
    else:
        y = z8.sum(axis=-2)  # [..., 36, 64]

    ya = y[..., T.YPRIME_A]
    yb = y[..., T.YPRIME_B] * jnp.asarray(T.YPRIME_S, dtype)
    yp = ya + yb  # [..., 36, 32]

    if exact_order:
        # s0/s1 accumulate over even/odd k ascending (subband.c:293-305)
        m = jnp.asarray(T.DCT16x32, dtype)  # [16, 32]
        s0 = yp[..., 0, None] * m[:, 0]
        s1 = yp[..., 1, None] * m[:, 1]
        for k in range(2, 32, 2):
            s0 = s0 + yp[..., k, None] * m[:, k]
            s1 = s1 + yp[..., k + 1, None] * m[:, k + 1]
        lo = s0 + s1                      # s[i], i in 0..15
        hi = (s0 - s1)[..., ::-1]         # s[31-i]
        s = jnp.concatenate([lo, hi], axis=-1)
    else:
        s = yp @ jnp.asarray(T.DCT_FULL.T, dtype)  # [..., 36, 32]
    return s, x[..., 1152:]
