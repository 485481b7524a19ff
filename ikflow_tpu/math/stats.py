"""Statistical distances: multiscale MMD.

``mmd_multiscale_ca`` is the parity implementation of the reference's
``MMD_multiscale`` (``/root/reference/ikflow/math_utils.py:6-43``): the
``C**a * ((C + d) / a) ** -a`` kernel family with caller-supplied ``c_list``/
``a_list`` and a ``reduce`` flag. The reference keeps it for the IKFlow
paper's MMD-baseline losses but does not use it on the main path.

``mmd_multiscale`` is a simpler rational-quadratic variant
(``a^2 / (a^2 + d)`` bandwidths) kept for convenience — it is NOT the
reference kernel.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def mmd_multiscale_ca(
    x: jnp.ndarray,
    y: jnp.ndarray,
    c_list: Sequence[float],
    a_list: Sequence[float],
    reduce: bool = True,
) -> jnp.ndarray:
    """Reference-parity multiscale MMD (``math_utils.py:6-43``).

    x, y: (n, d) sample sets (n must match — the kernel matrices are combined
    elementwise, as in the reference). Kernel: ``sum_i C_i**a_i *
    ((C_i + d) / a_i) ** -a_i`` over squared distances d, clamped at 0.
    ``reduce=True`` returns the scalar mean of ``XX + YY - 2 XY``;
    ``reduce=False`` returns the (n, n) matrix.
    """
    assert x.ndim == 2 and y.ndim == 2 and x.shape == y.shape, (x.shape, y.shape)
    assert len(c_list) == len(a_list), (c_list, a_list)
    xx, yy, xy = x @ x.T, y @ y.T, x @ y.T
    rx = jnp.broadcast_to(jnp.diag(xx)[None, :], xx.shape)
    ry = jnp.broadcast_to(jnp.diag(yy)[None, :], yy.shape)
    dxx = jnp.clip(rx.T + rx - 2.0 * xx, 0.0, jnp.inf)
    dyy = jnp.clip(ry.T + ry - 2.0 * yy, 0.0, jnp.inf)
    dxy = jnp.clip(rx.T + ry - 2.0 * xy, 0.0, jnp.inf)
    out = jnp.zeros_like(dxx)
    for c, a in zip(c_list, a_list):
        out = out + (
            c**a * ((c + dxx) / a) ** -a
            + c**a * ((c + dyy) / a) ** -a
            - 2.0 * c**a * ((c + dxy) / a) ** -a
        )
    return jnp.mean(out) if reduce else out

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
