"""Grow a trained N-block flow artifact into a deeper M-block warm-start init.

Blocks 0..N-1 are copied from the source; blocks N..M-1 get fresh subnets
whose FINAL linear layer is zero-initialized, making each new coupling the
identity map (s=0, t=0 after the soft clamp) — the GLOW paper's zero-init
trick. The new blocks' fixed permutations still apply, but a composition of
permutations acting on a standard-Gaussian latent changes nothing observable:
the grown model's NLL, samples, and val metrics are EXACTLY the source
model's at step 0 (verified below), and training grows into the added
capacity instead of starting over.

Usage: python scripts_dev/grow_flow_init.py SRC.npz DST.npz NB_NODES
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _pathfix  # noqa: F401

import jax
import numpy as np


def main(src: str, dst: str, nb_nodes: int) -> None:
    from ikflow_tpu.flow import FlowHyperParams, build_flow
    from ikflow_tpu.robots import get_robot
    from ikflow_tpu.training.checkpoints import export_deploy, load_deploy

    with np.load(src) as z:
        header = json.loads(bytes(z["__header__"]).decode())

    src_hp = FlowHyperParams.from_dict(header["hyper_parameters"])
    assert nb_nodes > src_hp.nb_nodes, (nb_nodes, src_hp.nb_nodes)
    robot = get_robot(header["robot_name"])
    src_flow = build_flow(src_hp, robot)
    src_params, _ = load_deploy(src, src_flow.init(jax.random.PRNGKey(0)))

    dst_hp = FlowHyperParams.from_dict(header["hyper_parameters"])
    dst_hp.nb_nodes = nb_nodes
    dst_flow = build_flow(dst_hp, robot)
    grown = list(dst_flow.init(jax.random.PRNGKey(1)))
    for i, blk in enumerate(src_params):
        grown[i] = blk  # permutation seeds are per-index, so these line up
    for i in range(len(src_params), nb_nodes):
        blk = jax.tree_util.tree_map(np.asarray, grown[i])
        for subnet in ("s1", "s2"):
            blk[subnet][-1] = {
                "w": np.zeros_like(blk[subnet][-1]["w"]),
                "b": np.zeros_like(blk[subnet][-1]["b"]),
            }
        grown[i] = blk
    grown = tuple(grown)

    # Verify exact NLL equivalence: the added identity couplings + their
    # permutations must not change density (|det P| = 1, isotropic base).
    q = np.asarray(robot.sample_joint_angles(jax.random.PRNGKey(2), 64))
    x = np.concatenate([q, np.zeros((64, dst_hp.dim_latent_space - robot.ndof), np.float32)], axis=1)
    cond = np.asarray(robot.forward_kinematics(q))
    z_src, ld_src = src_flow.forward(src_params, x, cond)
    z_dst, ld_dst = dst_flow.forward(grown, x, cond)
    nll = lambda z, ld: np.asarray(0.5 * np.sum(np.square(z), axis=1) - ld)
    err = float(np.max(np.abs(nll(z_src, ld_src) - nll(z_dst, ld_dst))))
    norm_err = float(np.max(np.abs(
        np.linalg.norm(np.asarray(z_src), axis=1) - np.linalg.norm(np.asarray(z_dst), axis=1)
    )))
    assert err < 1e-3 and norm_err < 1e-3, (err, norm_err)
    print(f"grow verified: max |dNLL| = {err:.2e}, max |d||z||| = {norm_err:.2e}")

    path = export_deploy(
        dst, grown, dst_hp, robot.name,
        global_step=header.get("global_step"),
        dtype="float16",
    )
    print(f"wrote grown warm-start init -> {path} "
          f"({src_hp.nb_nodes} -> {nb_nodes} blocks, source {src})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
