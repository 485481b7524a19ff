"""The product contract test: trained flagship weights must solve exact IK.

Faithful port of the reference's end-to-end exact-IK contract
(``/root/reference/tests/ikflow_solver_test.py:56-87``): 1000 random reachable
poses, retry tiers (1, 3, 10), at most 3 LM steps per tier, tolerance
1 mm / 0.01 rad -> >=99% of poses must converge AND every returned valid
solution must respect the joint limits.

Skips when no trained flagship artifact exists (fresh checkout / CI without
weights) so the suite stays green; with ``models/panda__full.npz`` present
(repo-shipped or cached) this is the single test that proves the trained
product works.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ikflow_tpu.config import MODEL_SEARCH_DIRS
from ikflow_tpu.flow import FlowHyperParams
from ikflow_tpu.robots import get_robot
from ikflow_tpu.solver import IKFlowSolver


def _flagship_weights_path():
    for d in MODEL_SEARCH_DIRS:
        p = os.path.join(d, "panda__full.npz")
        if os.path.exists(p):
            return p
    return None


N_POSES = int(os.environ.get("IKFLOW_TPU_CONTRACT_N", 1000))


@pytest.mark.slow
def test_exact_ik_contract_trained_weights():
    weights = _flagship_weights_path()
    if weights is None:
        pytest.skip("no trained panda__full.npz in models search path")

    from ikflow_tpu.training.checkpoints import load_deploy

    robot = get_robot("panda")
    hp = FlowHyperParams()
    hp.dim_latent_space = 7  # flagship architecture (model_descriptions.yaml)
    solver = IKFlowSolver(hp, robot, seed=0)
    params, header = load_deploy(weights, solver.params)
    solver.set_params(params)
    assert header["robot_name"] == "panda"

    key = jax.random.PRNGKey(42)
    kq, ks = jax.random.split(key)
    # Reachable targets: FK of in-limit joint samples (the reference draws
    # target poses the same way, ikflow_solver_test.py:60-63).
    q_gt = robot.sample_joint_angles(kq, N_POSES, joint_limit_eps=0.02)
    target_poses = robot.forward_kinematics(q_gt)

    solutions, valids = solver.generate_exact_ik_solutions(
        target_poses,
        repeat_counts=(1, 3, 10),
        pos_error_threshold=1e-3,
        rot_error_threshold=0.01,
        n_opt_steps_max=3,
        key=ks,
    )
    solutions = np.asarray(solutions)
    valids = np.asarray(valids)

    valid_fraction = valids.mean()
    assert valid_fraction >= 0.99, (
        f"only {valids.sum()}/{N_POSES} poses converged at 1mm/0.01rad "
        f"({valid_fraction:.3f} < 0.99)"
    )

    # Every valid solution within joint limits (reference asserts the same,
    # ikflow_solver_test.py:80-86).
    low = np.asarray(robot.limits_low())
    high = np.asarray(robot.limits_high())
    sols_valid = solutions[valids]
    assert (sols_valid >= low - 1e-6).all() and (sols_valid <= high + 1e-6).all()

    # And actually solve the poses: recompute FK errors independently.
    ev = solver.evaluate(target_poses, jnp.asarray(solutions))
    pos_err = np.asarray(ev.pos_errors)[valids]
    rot_err = np.asarray(ev.rot_errors)[valids]
    assert (pos_err <= 1e-3 + 1e-6).all(), f"max pos err {pos_err.max():.2e}"
    assert (rot_err <= 0.01 + 1e-6).all(), f"max rot err {rot_err.max():.2e}"
