"""Fused coupling-subnet MLP as a Pallas TPU kernel.

Why: the flow's hot inference path (``GlowFlow.inverse``) is 24 subnet MLPs of
shape in(~11..18) -> 1024 -> ... -> out(~8..20). Under plain XLA every hidden
activation (B, 1024) materializes to HBM between dots — ~32 KB/sample/block of
activation traffic, which dominates the pass (the weights are only ~17 MB per
block). This kernel runs the whole MLP for a tile of rows with all activations
resident in VMEM and the (zero-padded to lane width) weights resident across
the batch grid, so HBM sees only: weights once, input tile once, output tile
once — an order-of-magnitude cut in bytes moved.

Layout: feature dims are padded to 128 (lane width) on the host once; the
padded x columns are zeros and the padded W1 rows are zeros, so results are
exact. Rows (batch) are tiled by the grid; B is padded up to the tile size by
the wrapper and sliced after.

Autodiff: inference-only (no custom VJP) — training uses the jnp path in
``flow/model.py``; this kernel is swapped in for ``inverse`` when enabled.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LEAKY_SLOPE = 0.01
LANE = 128
DEFAULT_TILE_B = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mlp_kernel(n_layers: int, bf16_hidden: bool, *refs):
    """Kernel body: refs = (x_ref, w0, b0, w1, b1, ..., out_ref)."""
    x_ref = refs[0]
    out_ref = refs[-1]
    wb = refs[1:-1]
    h = x_ref[...]
    for i in range(n_layers):
        w = wb[2 * i][...]
        b = wb[2 * i + 1][...]
        if bf16_hidden and 0 < i < n_layers - 1:
            acc = jnp.dot(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        else:
            acc = jnp.dot(h, w, preferred_element_type=jnp.float32)
        h = acc + b
        if i < n_layers - 1:
            h = jnp.where(h > 0, h, _LEAKY_SLOPE * h)
    out_ref[...] = h


@functools.partial(jax.jit, static_argnames=("out_dim", "tile_b", "bf16_hidden", "interpret"))
def fused_mlp(
    x: jnp.ndarray,
    padded_layers: Sequence[jnp.ndarray],
    out_dim: int,
    tile_b: int = DEFAULT_TILE_B,
    bf16_hidden: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the fused MLP. ``x``: (B, in_dim) unpadded; ``padded_layers``: flat
    [w0, b0, w1, b1, ...] with feature dims pre-padded to the lane width
    (see ``pad_subnet_params``). Returns (B, out_dim)."""
    n_layers = len(padded_layers) // 2
    B, in_dim = x.shape
    in_pad = padded_layers[0].shape[0]
    out_pad = padded_layers[-1].shape[-1]

    Bp = _round_up(max(B, 8), tile_b)
    x_p = jnp.zeros((Bp, in_pad), x.dtype).at[:B, :in_dim].set(x)

    grid = (Bp // tile_b,)
    in_specs = [pl.BlockSpec((tile_b, in_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    for li in range(n_layers):
        w = padded_layers[2 * li]
        b = padded_layers[2 * li + 1]
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    out_specs = pl.BlockSpec((tile_b, out_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)

    flops = 2 * Bp * sum(
        padded_layers[2 * li].shape[0] * padded_layers[2 * li].shape[1] for li in range(n_layers)
    )
    bytes_accessed = (
        Bp * (in_pad + out_pad) * 4 + sum(int(np.prod(w.shape)) * 4 for w in padded_layers)
    )
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, n_layers, bf16_hidden),
        out_shape=jax.ShapeDtypeStruct((Bp, out_pad), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(x_p, *padded_layers)
    return out[:B, :out_dim]


def pad_subnet_params(layers) -> list:
    """Pad a jnp subnet (list of {'w','b'} dicts, from ``init_subnet``) to
    lane-aligned shapes: w (in_pad, out_pad), b (1, out_pad). Zero padding keeps
    the math exact (padded input columns are zero; padded outputs are sliced)."""
    out = []
    for layer in layers:
        w, b = layer["w"], layer["b"]
        ip, op = _round_up(w.shape[0], LANE), _round_up(w.shape[1], LANE)
        w_p = jnp.zeros((ip, op), w.dtype).at[: w.shape[0], : w.shape[1]].set(w)
        b_p = jnp.zeros((1, op), b.dtype).at[0, : b.shape[0]].set(b)
        out.extend([w_p, b_p])
    return out
