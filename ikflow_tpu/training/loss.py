"""Maximum-likelihood training loss with softflow conditioning and pad noise.

Parity with the reference training step (``/root/reference/ikflow/training/
lt_model.py:129-175`` and ``training_utils.py:11-25``), as a pure function:

    x   = [q, 0.001 * randn(pad)]                 (pad to dim_latent_space)
    c   ~ U(0,1) per row; x += randn_like(x) * c * softflow_noise_scale
    cond = [pose, c]
    z, logdet = flow.forward(x, cond)
    loss = mean(0.5 * ||z||^2 - logdet)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ikflow_tpu.config import SIGMOID_SCALING_ABS_MAX
from ikflow_tpu.flow.model import GlowFlow


def get_softflow_noise(key: jax.Array, x: jnp.ndarray, softflow_noise_scale: float):
    """(c, v): per-row noise magnitude c ~ U(0,1) and noise v = N(0,1)*c*scale.
    Parity: ``get_softflow_noise`` (``training_utils.py:11-25``)."""
    kc, kv = jax.random.split(key)
    c = jax.random.uniform(kc, (x.shape[0], 1), x.dtype)
    v = jax.random.normal(kv, x.shape, x.dtype) * c * softflow_noise_scale
    return c, v


def make_loss_fn(flow: GlowFlow, ndof: int):
    """Returns ``loss_fn(params, key, q, poses) -> (loss, metrics)`` (pure, jittable)."""
    hp = flow.hp
    pad_width = flow.D - ndof

    def loss_fn(params, key: jax.Array, q: jnp.ndarray, poses: jnp.ndarray) -> Tuple[jnp.ndarray, Dict]:
        n = q.shape[0]
        kpad, ksf = jax.random.split(key)
        x = q
        if pad_width > 0:
            # Hardcoded 0.001 pad noise, clamped under the sigmoid head
            # (lt_model.py:137-146).
            pad = 0.001 * jax.random.normal(kpad, (n, pad_width), q.dtype)
            if hp.sigmoid_on_output:
                eps = 1e-5
                pad = jnp.clip(pad, -SIGMOID_SCALING_ABS_MAX + eps, SIGMOID_SCALING_ABS_MAX - eps)
            x = jnp.concatenate([x, pad], axis=1)

        if hp.softflow_enabled:
            c, v = get_softflow_noise(ksf, x, hp.softflow_noise_scale)
            x = x + v
            cond = jnp.concatenate([poses, c], axis=1)
        else:
            cond = poses

        z, logdet = flow.forward(params, x, cond)
        nll = 0.5 * jnp.sum(z * z, axis=1) - logdet
        loss = jnp.mean(nll)
        metrics = {
            "tr/output_max": jnp.max(z),
            "tr/output_abs_ave": jnp.mean(jnp.abs(z)),
            "tr/output_ave": jnp.mean(z),
            "tr/output_std": jnp.std(z),
            "tr/loss_ml": loss,
        }
        return loss, metrics

    return loss_fn
