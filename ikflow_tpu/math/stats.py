"""Statistical distances: multiscale MMD.

Parity with ``/root/reference/ikflow/math_utils.py:6-43`` (``MMD_multiscale``),
which the reference keeps for the IKFlow paper's MMD-baseline losses but does
not use on the main path. Provided for the same completeness, batched in jnp.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

# The reference's two bandwidth presets (math_utils.py: 'multiscale' uses
# fixed bandwidths; callers pass custom lists for other scales).
DEFAULT_BANDWIDTHS = (0.2, 0.5, 0.9, 1.3)


def mmd_multiscale(
    x: jnp.ndarray, y: jnp.ndarray, bandwidths: Sequence[float] = DEFAULT_BANDWIDTHS
) -> jnp.ndarray:
    """Multiscale (rational-quadratic kernel) MMD between sample sets.

    x, y: (n, d). Returns a scalar. Kernel: sum_a a^2 / (a^2 + ||u - v||^2),
    the same family as the reference implementation.
    """
    assert x.ndim == 2 and y.ndim == 2 and x.shape[1] == y.shape[1]

    def sq_dists(a, b):
        aa = jnp.sum(a * a, axis=1)
        bb = jnp.sum(b * b, axis=1)
        ab = a @ b.T
        return aa[:, None] + bb[None, :] - 2.0 * ab

    dxx = sq_dists(x, x)
    dyy = sq_dists(y, y)
    dxy = sq_dists(x, y)

    xx = jnp.zeros_like(dxx)
    yy = jnp.zeros_like(dyy)
    xy = jnp.zeros_like(dxy)
    for a in bandwidths:
        a2 = a * a
        xx = xx + a2 / (a2 + dxx)
        yy = yy + a2 / (a2 + dyy)
        xy = xy + a2 / (a2 + dxy)
    return jnp.mean(xx) + jnp.mean(yy) - 2.0 * jnp.mean(xy)
