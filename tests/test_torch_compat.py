"""Migration-bridge tests: FrEIA-style state dict import and .pt dataset load.

A synthetic FrEIA state dict is built from a known params pytree, then imported
back — the round trip must be exact, and the imported model must produce the
same outputs.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ikflow_tpu.flow import build_flow, tiny_model_params
from ikflow_tpu.robots import get_robot


def _make_freia_state_dict(flow, params):
    """Serialize our params in FrEIA GraphINN naming (node order: head at 0,
    then per block PermuteRandom at 2k+1 and GLOWCouplingBlock at 2k+2)."""
    state = {}
    for bi, block in enumerate(params):
        node_idx = 2 + 2 * bi
        perm_idx = 1 + 2 * bi
        state[f"module_list.{perm_idx}.perm"] = np.asarray(flow._perms[bi])
        for sub_name, our_name in (("1", "s1"), ("2", "s2")):
            seq = 0
            for layer in block[our_name]:
                state[f"module_list.{node_idx}.subnet{sub_name}.{seq}.weight"] = np.asarray(layer["w"]).T
                state[f"module_list.{node_idx}.subnet{sub_name}.{seq}.bias"] = np.asarray(layer["b"])
                seq += 2  # Sequential skips the LeakyReLU modules
    return state


def test_state_dict_roundtrip_exact():
    from ikflow_tpu.training.torch_compat import import_reference_state_dict

    robot = get_robot("panda")
    hp = tiny_model_params()
    hp.dim_latent_space = 8
    flow = build_flow(hp, robot)
    params = flow.init(jax.random.PRNGKey(0))
    state = _make_freia_state_dict(flow, params)
    imported = import_reference_state_dict(state, flow, flow.init(jax.random.PRNGKey(1)))
    # Outputs identical to the original params.
    z = jax.random.normal(jax.random.PRNGKey(2), (8, flow.D))
    cond = jnp.zeros((8, flow.dim_cond))
    q1, _ = flow.inverse(params, z, cond)
    q2, _ = flow.inverse(imported, z, cond)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))


def test_state_dict_mismatch_errors():
    from ikflow_tpu.training.torch_compat import import_reference_state_dict

    robot = get_robot("panda")
    hp = tiny_model_params()
    hp.dim_latent_space = 8
    flow = build_flow(hp, robot)
    params = flow.init(jax.random.PRNGKey(0))
    state = _make_freia_state_dict(flow, params)

    # Wrong block count.
    hp2 = tiny_model_params()
    hp2.dim_latent_space = 8
    hp2.nb_nodes = 2
    flow2 = build_flow(hp2, robot)
    with pytest.raises(ValueError, match="coupling blocks"):
        import_reference_state_dict(state, flow2, flow2.init(jax.random.PRNGKey(0)))

    # Not a FrEIA dict at all.
    with pytest.raises(ValueError, match="no FrEIA"):
        import_reference_state_dict({"foo": np.zeros(3)}, flow, params)

    # Corrupted permutation.
    bad = dict(state)
    bad["module_list.1.perm"] = np.roll(state["module_list.1.perm"], 1)
    with pytest.raises(ValueError, match="permutation mismatch"):
        import_reference_state_dict(bad, flow, params)


def test_load_reference_dataset_pt():
    torch = pytest.importorskip("torch")
    from ikflow_tpu.training.torch_compat import load_reference_dataset

    with tempfile.TemporaryDirectory() as d:
        for name, shape in (
            ("samples_tr", (100, 7)),
            ("endpoints_tr", (100, 7)),
            ("samples_te", (20, 7)),
            ("endpoints_te", (20, 7)),
        ):
            torch.save(torch.randn(shape), os.path.join(d, f"{name}.pt"))
        ds = load_reference_dataset(d, "panda")
        assert ds.samples_tr.shape == (100, 7)
        assert ds.samples_te.shape == (20, 7)
        assert ds.robot_name == "panda"
