"""Psy model A: ATH + scalefactor fudge (libtoolame-dab/psycho_0.c)."""
import jax.numpy as jnp


def psycho_0(sf_index, ath_min, dtype=jnp.float64):
    """sf_index: [B, 3, 32] scalefactor indices (pre-scfsi).
    ath_min: [B, 32] minimum ATH per subband for the stream's samplerate.
    Returns smr [B, 32]  (psycho_0.c:1287-1307)."""
    minscale = sf_index.min(axis=-2)  # [B, 32]
    return 2.0 * (30.0 - minscale.astype(dtype)) - ath_min
