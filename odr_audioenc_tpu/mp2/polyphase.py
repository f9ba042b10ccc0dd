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

_DENSE_W = None


def _dense_weights():
    """The whole filterbank is linear in the 1632-sample input, so the f32
    throughput path collapses window+fold+DCT into ONE [1632, 36*32] matrix
    (7.5 MB, built once): a single dense MXU contraction replaces the
    [.., 36, 512] sliding-window gather (~300 MB of gather traffic per
    2048-stream step)."""
    global _DENSE_W
    if _DENSE_W is None:
        acc = np.zeros((1632, 36, 64))
        C = np.asarray(T.ENWINDOW, np.float64)
        t_idx = np.arange(36)
        for i in range(512):
            acc[511 + 32 * t_idx - i, t_idx, i % 64] += C[i]
        K = np.zeros((64, 32))
        ya, yb, ys = (np.asarray(T.YPRIME_A), np.asarray(T.YPRIME_B),
                      np.asarray(T.YPRIME_S, np.float64))
        for k in range(32):
            K[ya[k], k] += 1.0
            K[yb[k], k] += ys[k]
        K = K @ np.asarray(T.DCT_FULL, np.float64).T        # [64, 32]
        _DENSE_W = np.einsum("nti,is->nts", acc, K).reshape(1632, 36 * 32) \
            .astype(np.float32)
    return _DENSE_W


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
    if not exact_order:
        W = jnp.asarray(_dense_weights(), dtype)
        s = (x @ W).reshape(*x.shape[:-1], 36, 32)
        return s, x[..., 1152:]
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
