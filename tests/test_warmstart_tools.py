"""Warm-start tooling contracts (round 5).

Two techniques ship as scripts_dev tools and carry exactness claims; these
tests pin them on tiny models:

- ``grow_flow_init``: deepening a trained flow with zero-init identity
  couplings must preserve NLL exactly (the new blocks' permutations act on
  an isotropic Gaussian latent, which is unobservable).
- ``convert_softflow_init``: dropping the softflow conditioning column (the
  last input row of each coupling subnet's first layer) must reproduce the
  softflow network's inverse at noise scale 0 bit-exactly.
"""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ikflow_tpu.flow import FlowHyperParams, build_flow, tiny_model_params
from ikflow_tpu.robots import get_robot
from ikflow_tpu.training.checkpoints import export_deploy

_SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts_dev")


def _load(name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_SCRIPTS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_grow_flow_init_preserves_nll(tmp_path):
    grow = _load("grow_flow_init")
    robot = get_robot("panda")
    hp = tiny_model_params()
    hp.dim_latent_space = 8
    hp.softflow_enabled = False
    hp.sigmoid_on_output = True
    flow = build_flow(hp, robot)
    params = flow.init(jax.random.PRNGKey(3))
    src = str(tmp_path / "tiny_sigmoid.npz")
    export_deploy(src, params, hp, robot.name, global_step=7)

    dst = str(tmp_path / "grown.npz")
    grow.main(src, dst, hp.nb_nodes + 2)  # internal assertion: |dNLL| < 1e-3
    assert os.path.exists(dst)

    # Grown artifact loads into the deeper architecture and samples in-limit.
    from ikflow_tpu.solver import IKFlowSolver
    from ikflow_tpu.training.checkpoints import load_deploy

    hp2 = tiny_model_params()
    hp2.dim_latent_space = 8
    hp2.softflow_enabled = False
    hp2.sigmoid_on_output = True
    hp2.nb_nodes = hp.nb_nodes + 2
    solver = IKFlowSolver(hp2, robot, seed=0)
    grown, header = load_deploy(dst, solver.params)
    assert header["hyper_parameters"]["nb_nodes"] == hp.nb_nodes + 2
    solver.set_params(grown)
    pose = robot.forward_kinematics(robot.sample_joint_angles(jax.random.PRNGKey(0), 1))[0]
    sols = solver.generate_ik_solutions(pose, n=16, key=jax.random.PRNGKey(1))
    assert not bool(np.asarray(robot.joint_limits_exceeded(sols)).any())


def test_convert_softflow_init_is_exact(tmp_path):
    conv = _load("convert_softflow_init")
    robot = get_robot("panda")
    hp = tiny_model_params()
    hp.dim_latent_space = 8
    assert hp.softflow_enabled and not hp.sigmoid_on_output
    flow = build_flow(hp, robot)  # dim_cond 8
    params = flow.init(jax.random.PRNGKey(5))
    src = str(tmp_path / "tiny_softflow.npz")
    export_deploy(src, params, hp, robot.name, global_step=9)

    dst = str(tmp_path / "sigmoid_init.npz")
    conv.main(src, dst)  # internal assertion: max |dq| < 1e-5 at c=0

    from ikflow_tpu.training.checkpoints import load_deploy, read_deploy_header

    header = read_deploy_header(dst)
    assert header["hyper_parameters"]["sigmoid_on_output"] is True
    assert header["hyper_parameters"]["softflow_enabled"] is False

    hp2 = FlowHyperParams.from_dict(header["hyper_parameters"])
    flow2 = build_flow(hp2, robot)
    converted, _ = load_deploy(dst, flow2.init(jax.random.PRNGKey(0)))
    # First-layer input rows shrank by exactly the softflow column.
    assert converted[0]["s1"][0]["w"].shape[0] == params[0]["s1"][0]["w"].shape[0] - 1
