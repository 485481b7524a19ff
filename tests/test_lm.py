"""LM refinement contracts: restart-threshold semantics (VERDICT r4 weak #5).

The self-restart in ``lm.refine`` fires at ``lam >= restart_lambd`` (default
3.0) on a rejected step of a still-invalid pose — deliberately far below
``lambd_max`` (1e3); see the refine docstring for the budget rationale. These
tests pin the measured threshold so doc and behavior cannot drift apart
again.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ikflow_tpu.lm import refine
from ikflow_tpu.robots import get_robot


def _boundary_optimum(robot, target):
    """A config near the boundary optimum for an unreachable target: running
    damped LM long enough parks every pose at a local minimum where further
    steps are rejected."""
    q0 = jnp.tile(robot.sample_joint_angles(jax.random.PRNGKey(0), 1), (1, 1))
    _, _, q_final = refine(robot, q0, target, n_steps=60, pos_tol=1e-3, rot_tol=0.1)
    return q_final


def test_restart_fires_at_restart_lambd_not_lambd_max():
    robot = get_robot("panda")
    # Unreachable target: 100 m overhead. At the boundary optimum every LM
    # step is rejected, so lam multiplies by lambd_up (5.0) each step.
    target = jnp.asarray([[0.0, 0.0, 100.0, 1.0, 0.0, 0.0, 0.0]], jnp.float32)
    q_star = _boundary_optimum(robot, target)

    # One rejected step from lam=0.7 -> lam_next=3.5 >= restart_lambd=3.0:
    # the restart must fire (fresh random q), far below lambd_max=1e3.
    _, _, q_restarted = refine(
        robot, q_star, target, n_steps=1, pos_tol=1e-3, rot_tol=0.1,
        lambd=0.7, restart_key=jax.random.PRNGKey(7),
    )
    assert float(jnp.max(jnp.abs(q_restarted - q_star))) > 0.05, (
        "restart did not fire at lam 3.5 (threshold is restart_lambd=3.0, "
        "NOT lambd_max saturation)"
    )

    # Same single rejected step from lam=0.1 -> lam_next=0.5 < 3.0: no
    # restart; the (rejected) pose must stay exactly at its seed.
    _, _, q_kept = refine(
        robot, q_star, target, n_steps=1, pos_tol=1e-3, rot_tol=0.1,
        lambd=0.1, restart_key=jax.random.PRNGKey(7),
    )
    np.testing.assert_allclose(np.asarray(q_kept), np.asarray(q_star), atol=1e-6)


def test_restart_requires_restart_key():
    robot = get_robot("panda")
    target = jnp.asarray([[0.0, 0.0, 100.0, 1.0, 0.0, 0.0, 0.0]], jnp.float32)
    q_star = _boundary_optimum(robot, target)
    _, _, q_final = refine(
        robot, q_star, target, n_steps=1, pos_tol=1e-3, rot_tol=0.1, lambd=0.7,
    )
    np.testing.assert_allclose(np.asarray(q_final), np.asarray(q_star), atol=1e-6)
