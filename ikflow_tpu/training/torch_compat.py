"""Migration bridge from the reference (torch) artifacts.

Two import paths for users switching from jstmn/ikflow:

1. ``import_reference_state_dict`` — maps a FrEIA ``GraphINN`` state dict (the
   reference's deploy pickle, ``download_model_from_wandb_checkpoint.py:13-28``
   strips the ``nn_model.`` prefix) onto this framework's parameter pytree.
   FrEIA key layout: ``module_list.<node>.subnet{1,2}.<seq>.{weight,bias}``
   for GLOW coupling blocks (Sequential indices skip the LeakyReLU layers);
   torch Linear stores weights (out, in), transposed here.

2. ``load_reference_dataset`` — reads the reference's 4-tensor ``.pt`` dataset
   directory (``build_dataset.py:124-140``) into an ``IkDataset``.

Caveats (documented, asserted where possible):
- The architecture must match (nb_nodes / widths / split sizes are validated
  leaf-by-leaf against ``flow.init``'s shapes).
- Our permutations reproduce ``Fm.PermuteRandom(seed=i)`` exactly, and the
  input-head scaling constants are rebuilt from the robot's joint limits, so
  only the subnet weights need importing. When permutation buffers are present
  in the state dict they are checked against ours.
- Exact numeric parity with a reference model additionally requires the same
  clamp activation variant (``FlowHyperParams.clamp_activation``).
"""

from __future__ import annotations

import re
from typing import Dict, Union

import numpy as np

from ikflow_tpu.flow.model import GlowFlow


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    try:
        import torch

        if isinstance(v, torch.Tensor):
            return v.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(v)


def load_reference_pickle(path: str) -> Dict[str, np.ndarray]:
    """Load a reference deploy pickle (a pickled state dict of torch tensors)."""
    import pickle

    with open(path, "rb") as f:
        state = pickle.load(f)
    return {k: _to_numpy(v) for k, v in state.items()}


_SUBNET_KEY = re.compile(r"^module_list\.(\d+)\.subnet([12])\.(\d+)\.(weight|bias)$")
_PERM_KEY = re.compile(r"^module_list\.(\d+)\.(perm|perm_inv|w_perm|w_perm_inv)$")


def import_reference_state_dict(
    state: Union[str, Dict[str, np.ndarray]], flow: GlowFlow, params_template
):
    """Map a FrEIA GraphINN state dict onto this flow's parameter pytree.

    ``params_template`` (from ``flow.init``) supplies structure and expected
    shapes. Returns a new params pytree. Raises with a precise message on any
    architecture mismatch.
    """
    if isinstance(state, str):
        state = load_reference_pickle(state)
    state = {k: _to_numpy(v) for k, v in state.items()}

    # Collect coupling nodes: node_idx -> {('1'|'2') -> {seq_idx -> {w, b}}}.
    nodes: Dict[int, Dict[str, Dict[int, Dict[str, np.ndarray]]]] = {}
    for k, v in state.items():
        m = _SUBNET_KEY.match(k)
        if not m:
            continue
        node, sub, seq, kind = int(m.group(1)), m.group(2), int(m.group(3)), m.group(4)
        nodes.setdefault(node, {}).setdefault(sub, {}).setdefault(seq, {})[kind] = v
    if not nodes:
        raise ValueError(
            "no FrEIA coupling-subnet keys (module_list.N.subnetM.K.weight) found; "
            f"state dict keys look like: {list(state)[:5]}"
        )
    coupling_nodes = sorted(nodes.keys())
    if len(coupling_nodes) != flow.hp.nb_nodes:
        raise ValueError(
            f"state dict has {len(coupling_nodes)} coupling blocks, flow has {flow.hp.nb_nodes}"
        )

    # Optional: verify permutations match Fm.PermuteRandom(seed=i).
    perm_nodes = {}
    for k, v in state.items():
        m = _PERM_KEY.match(k)
        if m:
            perm_nodes.setdefault(int(m.group(1)), {})[m.group(2)] = v
    for i, node_idx in enumerate(sorted(perm_nodes.keys())):
        bufs = perm_nodes[node_idx]
        ours = flow._perms[i]
        if "perm" in bufs and bufs["perm"].ndim == 1:
            theirs = bufs["perm"].astype(np.int64)
            if not np.array_equal(np.sort(theirs), np.arange(len(ours))):
                continue  # not an index vector we understand
            if not np.array_equal(theirs, ours):
                raise ValueError(
                    f"permutation mismatch at block {i}: reference {theirs}, ours {ours}"
                )

    new_blocks = []
    for bi, node_idx in enumerate(coupling_nodes):
        block_tmpl = params_template[bi]
        new_block = {}
        for sub_name, our_name in (("1", "s1"), ("2", "s2")):
            seqs = nodes[node_idx].get(sub_name)
            if seqs is None:
                raise ValueError(f"block {bi}: missing subnet{sub_name}")
            layers_in_order = [seqs[k] for k in sorted(seqs.keys())]
            tmpl_layers = block_tmpl[our_name]
            if len(layers_in_order) != len(tmpl_layers):
                raise ValueError(
                    f"block {bi} subnet{sub_name}: {len(layers_in_order)} linear layers in "
                    f"state dict, {len(tmpl_layers)} expected (depth mismatch?)"
                )
            new_layers = []
            for li, (ref_layer, tmpl) in enumerate(zip(layers_in_order, tmpl_layers)):
                w = ref_layer["weight"].T  # torch (out, in) -> (in, out)
                b = ref_layer["bias"]
                if w.shape != tmpl["w"].shape or b.shape != tmpl["b"].shape:
                    raise ValueError(
                        f"block {bi} subnet{sub_name} layer {li}: shapes {w.shape}/{b.shape} "
                        f"vs expected {tmpl['w'].shape}/{tmpl['b'].shape}"
                    )
                import jax.numpy as jnp

                new_layers.append({"w": jnp.asarray(w, tmpl["w"].dtype), "b": jnp.asarray(b, tmpl["b"].dtype)})
            new_block[our_name] = new_layers
        new_blocks.append(new_block)
    return tuple(new_blocks)


def load_reference_dataset(directory: str, robot_name: str):
    """Read the reference's .pt dataset directory into an IkDataset
    (tensors: samples_tr / endpoints_tr / samples_te / endpoints_te —
    ``build_dataset.py:124-140``)."""
    import os

    import torch

    from ikflow_tpu.training.dataset import IkDataset

    arrays = {}
    for name in ("samples_tr", "endpoints_tr", "samples_te", "endpoints_te"):
        path = os.path.join(directory, f"{name}.pt")
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        arrays[name] = torch.load(path, map_location="cpu", weights_only=True).numpy()
    return IkDataset(
        arrays["samples_tr"], arrays["endpoints_tr"], arrays["samples_te"], arrays["endpoints_te"],
        robot_name,
    )
