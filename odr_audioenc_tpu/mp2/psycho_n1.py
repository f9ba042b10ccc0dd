"""Null psychoacoustic model (psycho_n1.c): canned per-subband SNR values,
no modelling.

Unreachable from the reference's public API (toolame_set_psy_model clamps
the model to 0..3, toolame.c:202-210, so the `case -1` dispatch at
toolame.c:363 is dead from outside) - provided for SURVEY §2.2 inventory
completeness and as a zero-cost smoke model for throughput tests.
"""
import jax.numpy as jnp
import numpy as np

# "From Castanets.wav" (psycho_n1.c:14-17)
SNRDEF = np.array([
    30, 17, 16, 10, 3, 12, 8, 2.5, 5, 5, 6, 6, 5, 6, 10, 6, -4,
    -10, -21, -30, -42, -55, -68, -75, -75, -75, -75, -75, -91, -107,
    -110, -108], np.float64)


def psycho_n1(shape_like, dtype=jnp.float64):
    """Returns smr [B, 2, 32] = the canned table broadcast (psycho_n1 writes
    ltmin=snrdef per channel; smr = ltmin directly for the null model)."""
    B = shape_like
    return jnp.broadcast_to(jnp.asarray(SNRDEF, dtype), (B, 2, 32))
