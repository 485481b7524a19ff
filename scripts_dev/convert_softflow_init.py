"""Convert a softflow-conditioned deploy artifact into a warm-start init for a
sigmoid-head (no-softflow) model of the same depth.

Why this is exact for the coupling blocks: softflow adds one conditional
column (the noise scale, ``dim_cond`` 7 -> 8) that is ALWAYS ZERO at
inference (`solver._conditional` zero-pads it), so the last input row of each
coupling subnet's first linear layer never contributes to inference outputs.
Dropping that row yields a dim_cond=7 network whose inverse pass is
bit-identical (f32) to the softflow network evaluated at noise scale 0 —
verified below on CPU before writing. The sigmoid output head itself is
parameter-free (flow/model.py: head is constants + logit/sigmoid), so the
same parameter tree serves as the warm-start for ``sigmoid_on_output=True``
training; only the output-head transform must be re-learned by the anneal.

Usage: python scripts_dev/convert_softflow_init.py SRC.npz DST.npz
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _pathfix  # noqa: F401

import jax
import numpy as np


def main(src: str, dst: str) -> None:
    from ikflow_tpu.flow import FlowHyperParams, build_flow
    from ikflow_tpu.robots import get_robot
    from ikflow_tpu.training.checkpoints import export_deploy

    with np.load(src) as z:
        header = json.loads(bytes(z["__header__"]).decode())
        flat = {k: np.asarray(z[k], dtype=np.float32) for k in z.files if k != "__header__"}

    src_hp = FlowHyperParams.from_dict(header["hyper_parameters"])
    assert src_hp.softflow_enabled and not src_hp.sigmoid_on_output, (
        "source must be a softflow-conditioned affine-head artifact"
    )
    robot = get_robot(header["robot_name"])

    # Target hyperparameters: same stack, sigmoid head, no softflow.
    dst_hp = FlowHyperParams.from_dict(header["hyper_parameters"])
    dst_hp.softflow_enabled = False
    dst_hp.sigmoid_on_output = True

    dst_flow = build_flow(dst_hp, robot)  # dim_cond 7
    template = dst_flow.init(jax.random.PRNGKey(0))

    # Drop the (last) softflow input row wherever the template expects one
    # fewer input row than the artifact carries.
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves, dropped = [], 0
    for path_elems, leaf in leaves_with_paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path_elems)
        arr = flat[key]
        if arr.shape != leaf.shape:
            assert arr.ndim == 2 and arr.shape[0] == leaf.shape[0] + 1 and arr.shape[1] == leaf.shape[1], (
                f"unexpected mismatch for {key}: {arr.shape} vs {leaf.shape}"
            )
            arr = arr[:-1]  # the softflow column is the last cond input row
            dropped += 1
        new_leaves.append(arr)
    params = jax.tree_util.tree_unflatten(treedef, new_leaves)
    assert dropped == 2 * len(params), f"expected 2 drops per block, got {dropped}"

    # ---- Verify block-level equivalence on CPU: the converted (dim_cond 7)
    # network must match the source network at softflow scale 0, pre-head.
    # Compare through an affine-head dim_cond-7 flow vs the source flow.
    chk_hp = FlowHyperParams.from_dict(header["hyper_parameters"])
    chk_hp.softflow_enabled = False  # affine head, dim_cond 7
    chk_flow = build_flow(chk_hp, robot)
    src_flow = build_flow(src_hp, robot)  # dim_cond 8
    src_template = src_flow.init(jax.random.PRNGKey(0))
    s_leaves, s_treedef = jax.tree_util.tree_flatten_with_path(src_template)
    src_params = jax.tree_util.tree_unflatten(
        s_treedef,
        [flat["/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in pe)] for pe, _ in s_leaves],
    )
    z0 = jax.random.normal(jax.random.PRNGKey(1), (64, dst_hp.dim_latent_space))
    cond7 = jax.random.normal(jax.random.PRNGKey(2), (64, 7))
    cond8 = np.concatenate([np.asarray(cond7), np.zeros((64, 1), np.float32)], axis=1)
    q_src, _ = src_flow.inverse(src_params, z0, cond8)
    q_chk, _ = chk_flow.inverse(params, z0, cond7)
    err = float(np.max(np.abs(np.asarray(q_src) - np.asarray(q_chk))))
    assert err < 1e-5, f"converted network diverges from source at c=0: max |dq| = {err}"
    print(f"block equivalence verified: max |dq| = {err:.2e} over 64 probes")

    path = export_deploy(
        dst, params, dst_hp, robot.name,
        global_step=header.get("global_step"),
        dtype="float16",
    )
    print(f"wrote warm-start init -> {path} (source {src}, "
          f"step {header.get('global_step')}, dropped {dropped} softflow rows)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
