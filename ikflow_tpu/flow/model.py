"""Conditional GLOW coupling flow — the network core, pure JAX.

Brand-new implementation of the capability provided in the reference by the
FrEIA graph (``glow_cNF_model``, ``/root/reference/ikflow/model.py:291-356``):
a stack of ``nb_nodes`` x (fixed random permutation -> conditional affine GLOW
coupling) between an input normalization head and the latent space.

Design notes (TPU-first):
- Parameters are a plain pytree (tuple of per-block dicts); both directions are
  pure functions traced once under ``jit``. Blocks are unrolled in Python: the
  permutations become compile-time gathers XLA folds into the surrounding ops,
  and every coupling subnet lowers to large (batch x width) MXU matmuls — the
  batch axis is the only large axis and the only sharded axis.
- Semantics match FrEIA where behavior is observable:
  * split sizes pinned to ``split_len1 = D // 2`` (compat note at
    ``/root/reference/ikflow/model.py:320-336``),
  * soft clamp ``s -> clamp * (2/pi) * atan(s)`` (FrEIA >= 0.2 "ATAN"
    activation; the pre-rewrite ``atan(s/clamp)`` variant is available via
    ``clamp_activation="atan_scaled"``),
  * per-block permutations drawn from ``np.random.RandomState(seed=i)``
    exactly like ``Fm.PermuteRandom`` (``model.py:339``),
  * subnet MLPs: 1-4 hidden LeakyReLU layers of width
    ``coeff_fn_internal_size`` (``subnet_constructor``, ``model.py:51-96``),
    torch-Linear-style U(+-1/sqrt(fan_in)) init,
  * input head: either diagonal scaling of joints to ~[-1, 1]
    (``model.py:310-316``) or exact joint-limits->[0,1] affine + inverse-sigmoid
    (``get_pre_sigmoid_scaling_node`` + ``InvertibleSigmoidFlipped``,
    ``model.py:101-148,241-288``).

Direction convention (same as the reference): ``forward`` maps joint
configurations q -> latent z (training), ``inverse`` maps z -> q (inference,
the hot path: ``ikflow_solver.py:98`` runs the FrEIA graph with ``rev=True``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ikflow_tpu.config import SIGMOID_SCALING_ABS_MAX
from ikflow_tpu.flow.params import FlowHyperParams

_TWO_OVER_PI = 2.0 / np.pi
_LEAKY_SLOPE = 0.01  # torch.nn.LeakyReLU default


# ---------------------------------------------------------------------------
# Subnet MLP.
# ---------------------------------------------------------------------------


def init_subnet(key: jax.Array, ch_in: int, width: int, depth: int, ch_out: int, dtype=jnp.float32):
    """Init one coupling subnet: ``depth`` hidden LeakyReLU layers of ``width``.

    Weight/bias init matches torch.nn.Linear defaults (U(+-1/sqrt(fan_in))) so
    training dynamics are comparable to the reference's FrEIA subnets.
    """
    assert depth in (1, 2, 3, 4), "subnet depth (coeff_fn_config) must be in [1, 4]"
    dims = [ch_in] + [width] * depth + [ch_out]
    layers = []
    for i in range(len(dims) - 1):
        key, wk, bk = jax.random.split(key, 3)
        bound = 1.0 / np.sqrt(dims[i])
        w = jax.random.uniform(wk, (dims[i], dims[i + 1]), dtype, -bound, bound)
        b = jax.random.uniform(bk, (dims[i + 1],), dtype, -bound, bound)
        layers.append({"w": w, "b": b})
    return layers


def apply_subnet(layers: Sequence[Dict[str, jnp.ndarray]], x: jnp.ndarray, bf16_hidden: bool = False) -> jnp.ndarray:
    """MLP forward. LeakyReLU after every layer except the last.

    With ``bf16_hidden`` the wide hidden matmuls run in bfloat16 on the MXU
    with float32 accumulation; first/last layers (tiny dims, logdet-critical
    outputs) stay float32.
    """
    n = len(layers)
    h = x
    for i, layer in enumerate(layers):
        w, b = layer["w"], layer["b"]
        if bf16_hidden and 0 < i < n - 1:
            h = jnp.dot(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        else:
            h = jnp.dot(h, w, preferred_element_type=jnp.float32)
        h = h + b
        if i < n - 1:
            h = jax.nn.leaky_relu(h, _LEAKY_SLOPE)
    return h


# ---------------------------------------------------------------------------
# Flow definition.
# ---------------------------------------------------------------------------


class GlowFlow:
    """Static flow definition; parameters live in a separate pytree.

    Args:
        hp: hyperparameters (see FlowHyperParams).
        joint_limits: ``ndof`` (low, high) pairs — drives the input head.
        dim_cond: conditional width (7, or 8 with softflow —
            ``/root/reference/ikflow/ikflow_solver.py:51-53``).
    """

    def __init__(self, hp: FlowHyperParams, joint_limits: Sequence[Tuple[float, float]], dim_cond: int):
        assert hp.coupling_layer == "glow", hp.coupling_layer
        self.hp = hp
        self.dim_cond = dim_cond
        self.ndof = len(joint_limits)
        self.D = hp.dim_latent_space
        assert self.D >= self.ndof, (
            f"dim_latent_space ({self.D}) must be >= ndof ({self.ndof}); extra dims are noise-padded"
        )
        self.split1 = self.D // 2  # pinned old-FrEIA split (model.py:331-336)
        self.split2 = self.D - self.split1
        self.clamp = float(hp.rnvp_clamp)
        assert hp.clamp_activation in ("atan", "atan_scaled")

        # Per-block fixed permutations, exactly Fm.PermuteRandom(seed=i):
        # output[:, j] = input[:, perm[j]].
        if hp.permute_random_enabled:
            self._perms = [np.random.RandomState(i).permutation(self.D) for i in range(hp.nb_nodes)]
        else:
            self._perms = [np.arange(self.D) for _ in range(hp.nb_nodes)]
        self._inv_perms = [np.argsort(p) for p in self._perms]

        # Input normalization head constants.
        lows = np.array([lim[0] for lim in joint_limits], dtype=np.float64)
        highs = np.array([lim[1] for lim in joint_limits], dtype=np.float64)
        self.joint_limits = [(float(lo), float(hi)) for lo, hi in joint_limits]
        if hp.sigmoid_on_output:
            # Joints -> [0, 1] exactly; pads map (-SMAX, SMAX) -> (0, 1).
            # Parity: get_pre_sigmoid_scaling_node (model.py:241-288).
            slope = np.ones(self.D)
            offset = np.zeros(self.D)
            slope[: self.ndof] = 1.0 / (highs - lows)
            offset[: self.ndof] = -lows / (highs - lows)
            smax = SIGMOID_SCALING_ABS_MAX
            slope[self.ndof :] = 1.0 / (2.0 * smax)
            offset[self.ndof :] = 0.5
            self._head_scale = slope
            self._head_offset = offset
        else:
            # Joints scaled by 1/max(|lo|, |hi|) to ~[-1, 1]; pads untouched.
            # Parity: model.py:310-316.
            scale = np.ones(self.D)
            scale[: self.ndof] = 1.0 / np.maximum(np.abs(lows), np.abs(highs))
            self._head_scale = scale
            self._head_offset = np.zeros(self.D)
        self._head_logdet = float(np.sum(np.log(np.abs(self._head_scale))))

    # ------------------------------------------------------------------
    def init(self, key: jax.Array, dtype=jnp.float32):
        """Initialize parameters: tuple of per-block {'s1': layers, 's2': layers}.

        subnet1: (split1 + cond) -> 2*split2 ; subnet2: (split2 + cond) -> 2*split1
        (FrEIA GLOWCouplingBlock wiring).
        """
        hp = self.hp
        blocks = []
        for _ in range(hp.nb_nodes):
            key, k1, k2 = jax.random.split(key, 3)
            s1 = init_subnet(
                k1, self.split1 + self.dim_cond, hp.coeff_fn_internal_size, hp.coeff_fn_config, 2 * self.split2, dtype
            )
            s2 = init_subnet(
                k2, self.split2 + self.dim_cond, hp.coeff_fn_internal_size, hp.coeff_fn_config, 2 * self.split1, dtype
            )
            blocks.append({"s1": s1, "s2": s2})
        return tuple(blocks)

    # ------------------------------------------------------------------
    def _clamped(self, s: jnp.ndarray) -> jnp.ndarray:
        if self.hp.clamp_activation == "atan":
            return self.clamp * _TWO_OVER_PI * jnp.arctan(s)
        return self.clamp * _TWO_OVER_PI * jnp.arctan(s / self.clamp)

    def _couple_forward(self, block, x: jnp.ndarray, cond: jnp.ndarray):
        """One GLOW coupling, x -> y with logdet. FrEIA _coupling1/_coupling2 order."""
        bf16 = self.hp.bf16_hidden
        x1, x2 = x[:, : self.split1], x[:, self.split1 :]
        a2 = apply_subnet(block["s2"], jnp.concatenate([x2, cond], axis=1), bf16)
        s2 = self._clamped(a2[:, : self.split1])
        t2 = a2[:, self.split1 :]
        y1 = x1 * jnp.exp(s2) + t2
        a1 = apply_subnet(block["s1"], jnp.concatenate([y1, cond], axis=1), bf16)
        s1 = self._clamped(a1[:, : self.split2])
        t1 = a1[:, self.split2 :]
        y2 = x2 * jnp.exp(s1) + t1
        logdet = jnp.sum(s1, axis=1) + jnp.sum(s2, axis=1)
        return jnp.concatenate([y1, y2], axis=1), logdet

    def _couple_inverse(self, block, y: jnp.ndarray, cond: jnp.ndarray):
        """One GLOW coupling inverse, y -> x with logdet of the inverse map."""
        bf16 = self.hp.bf16_hidden
        y1, y2 = y[:, : self.split1], y[:, self.split1 :]
        a1 = apply_subnet(block["s1"], jnp.concatenate([y1, cond], axis=1), bf16)
        s1 = self._clamped(a1[:, : self.split2])
        t1 = a1[:, self.split2 :]
        x2 = (y2 - t1) * jnp.exp(-s1)
        a2 = apply_subnet(block["s2"], jnp.concatenate([x2, cond], axis=1), bf16)
        s2 = self._clamped(a2[:, : self.split1])
        t2 = a2[:, self.split1 :]
        x1 = (y1 - t2) * jnp.exp(-s2)
        logdet = -(jnp.sum(s1, axis=1) + jnp.sum(s2, axis=1))
        return jnp.concatenate([x1, x2], axis=1), logdet

    # ------------------------------------------------------------------
    def _head_forward(self, x: jnp.ndarray):
        """Input head, q-space -> flow-space, with logdet."""
        dtype = x.dtype
        scale = jnp.asarray(self._head_scale, dtype)
        offset = jnp.asarray(self._head_offset, dtype)
        n = x.shape[0]
        out = x * scale + offset
        logdet = jnp.full((n,), self._head_logdet, dtype)
        if self.hp.sigmoid_on_output:
            # logit with its diagonal logdet: d/du logit(u) = 1/(u(1-u)).
            out_clipped = jnp.clip(out, 1e-7, 1.0 - 1e-7)
            z = jnp.log(out_clipped / (1.0 - out_clipped))
            logdet = logdet - jnp.sum(jax.nn.log_sigmoid(z) + jax.nn.log_sigmoid(-z), axis=1)
            out = z
        return out, logdet

    def _head_inverse(self, u: jnp.ndarray):
        """Flow-space -> q-space, with logdet of the inverse map."""
        dtype = u.dtype
        scale = jnp.asarray(self._head_scale, dtype)
        offset = jnp.asarray(self._head_offset, dtype)
        n = u.shape[0]
        logdet = jnp.full((n,), -self._head_logdet, dtype)
        if self.hp.sigmoid_on_output:
            # sigmoid: logdet = sum log sigmoid'(u); hard-bounds outputs so the
            # final q is inside joint limits (model_test.py:108-123 contract).
            logdet = logdet + jnp.sum(jax.nn.log_sigmoid(u) + jax.nn.log_sigmoid(-u), axis=1)
            u = jax.nn.sigmoid(u)
        return (u - offset) / scale, logdet

    # ------------------------------------------------------------------
    def forward(self, params, x: jnp.ndarray, cond: jnp.ndarray):
        """q-space -> latent z, with total log|det J|. x: (n, D), cond: (n, dim_cond)."""
        assert x.ndim == 2 and x.shape[1] == self.D, x.shape
        assert cond.shape == (x.shape[0], self.dim_cond), (cond.shape, x.shape)
        h, logdet = self._head_forward(x)
        for i, block in enumerate(params):
            perm = jnp.asarray(self._perms[i])
            h = jnp.take(h, perm, axis=1)
            h, ld = self._couple_forward(block, h, cond)
            logdet = logdet + ld
        return h, logdet

    def inverse(self, params, z: jnp.ndarray, cond: jnp.ndarray):
        """Latent z -> q-space, with log|det J| of the inverse map (the hot
        inference path — reference call: ``ikflow_solver.py:98`` with rev=True)."""
        assert z.ndim == 2 and z.shape[1] == self.D, z.shape
        assert cond.shape == (z.shape[0], self.dim_cond), (cond.shape, z.shape)
        h = z
        logdet = jnp.zeros((z.shape[0],), z.dtype)
        for i in reversed(range(len(params))):
            h, ld = self._couple_inverse(params[i], h, cond)
            logdet = logdet + ld
            inv_perm = jnp.asarray(self._inv_perms[i])
            h = jnp.take(h, inv_perm, axis=1)
        h, ld = self._head_inverse(h)
        return h, logdet + ld

    # ------------------------------------------------------------------
    # Pallas fused-subnet inference path (see flow/pallas_subnet.py).
    # ------------------------------------------------------------------
    def pad_params_for_pallas(self, params):
        """Pre-pad all subnet weights to lane-aligned shapes (done once per
        trained parameter set, e.g. at ``IKFlowSolver.set_params`` time)."""
        from ikflow_tpu.flow.pallas_subnet import pad_subnet_params

        return tuple(
            {"s1": pad_subnet_params(b["s1"]), "s2": pad_subnet_params(b["s2"])} for b in params
        )

    def inverse_fused(self, padded_params, z: jnp.ndarray, cond: jnp.ndarray,
                      tile_b: int = 512, interpret: bool = False):
        """``inverse`` with each coupling subnet running as one fused Pallas
        kernel (activations VMEM-resident across layers). Numerics match the
        jnp path to f32 rounding. No logdet (inference sampling doesn't use it)
        and no autodiff — training stays on the jnp path."""
        from ikflow_tpu.flow.pallas_subnet import fused_mlp

        assert z.ndim == 2 and z.shape[1] == self.D, z.shape
        bf16 = self.hp.bf16_hidden
        h = z
        for i in reversed(range(len(padded_params))):
            block = padded_params[i]
            y1, y2 = h[:, : self.split1], h[:, self.split1 :]
            a1 = fused_mlp(jnp.concatenate([y1, cond], axis=1), block["s1"],
                           2 * self.split2, tile_b=tile_b, bf16_hidden=bf16, interpret=interpret)
            s1 = self._clamped(a1[:, : self.split2])
            t1 = a1[:, self.split2 :]
            x2 = (y2 - t1) * jnp.exp(-s1)
            a2 = fused_mlp(jnp.concatenate([x2, cond], axis=1), block["s2"],
                           2 * self.split1, tile_b=tile_b, bf16_hidden=bf16, interpret=interpret)
            s2 = self._clamped(a2[:, : self.split1])
            t2 = a2[:, self.split1 :]
            x1 = (y1 - t2) * jnp.exp(-s2)
            h = jnp.concatenate([x1, x2], axis=1)
            h = jnp.take(h, jnp.asarray(self._inv_perms[i]), axis=1)
        h, _ = self._head_inverse(h)
        return h

    # ------------------------------------------------------------------
    def n_params(self, params) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def build_flow(hp: FlowHyperParams, robot, dim_cond: Optional[int] = None) -> GlowFlow:
    """Convenience builder mirroring ``glow_cNF_model(params, robot, dim_cond,
    ndim_tot)`` (``/root/reference/ikflow/model.py:291``)."""
    if dim_cond is None:
        dim_cond = 8 if hp.softflow_enabled else 7
    return GlowFlow(hp, robot.actuated_joints_limits, dim_cond)
