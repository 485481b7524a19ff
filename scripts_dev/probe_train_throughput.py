"""Quick training-throughput probe on the real chip: steps/s for candidate
(batch_size, bf16_hidden) recipes, using the actual Trainer scan-step program
on a synthetic resident dataset. Informs the round's training recipe."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from ikflow_tpu.flow import FlowHyperParams, build_flow
from ikflow_tpu.robots import get_robot
from ikflow_tpu.training import TrainConfig, Trainer
from ikflow_tpu.training.dataset import IkDataset


def probe(batch_size: int, bf16_hidden: bool, steps_per_call: int = 100) -> float:
    hp = FlowHyperParams()
    hp.dim_latent_space = 7
    hp.bf16_hidden = bf16_hidden
    robot = get_robot("panda")
    flow = build_flow(hp, robot)
    params = flow.init(jax.random.PRNGKey(0))
    n = 200_000
    k = jax.random.PRNGKey(1)
    q = robot.sample_joint_angles(k, n, 0.004)
    poses = robot.forward_kinematics(q)
    ds = IkDataset(np.asarray(q), np.asarray(poses), np.asarray(q[:128]), np.asarray(poses[:128]), "panda")
    cfg = TrainConfig(batch_size=batch_size, n_steps=10**9, eval_every=0, checkpoint_every=0)
    tr = Trainer(flow, robot, cfg)
    many = tr._build_scan_steps(ds.n_train, steps_per_call)
    opt_state = tr.optimizer.init(params)
    params = jax.tree_util.tree_map(jnp.copy, params)
    opt_state = jax.tree_util.tree_map(jnp.copy, opt_state)
    samples, endpoints = jnp.asarray(ds.samples_tr), jnp.asarray(ds.endpoints_tr)
    key = jax.random.PRNGKey(2)
    t0 = time.time()
    params, opt_state, key, mean_loss, last_loss = many(params, opt_state, key, samples, endpoints)
    float(last_loss)
    compile_s = time.time() - t0
    # two timed calls
    ts = []
    for _ in range(2):
        t0 = time.time()
        params, opt_state, key, mean_loss, last_loss = many(params, opt_state, key, samples, endpoints)
        float(last_loss)
        ts.append(time.time() - t0)
    dt = min(ts)
    sps = steps_per_call / dt
    print(
        f"batch={batch_size} bf16_hidden={bf16_hidden}: {sps:.1f} steps/s "
        f"({sps * batch_size / 1e3:.0f}k samples/s), compile {compile_s:.0f}s, loss {float(last_loss):.3f}",
        flush=True,
    )
    return sps


if __name__ == "__main__":
    for b, bf in [(4096, False), (4096, True), (8192, True), (2048, False)]:
        probe(b, bf)
