"""Host-side visualization: skeleton renders and solution-sweep animations.

The reference's visualization layer (``/root/reference/ikflow/visualizations.py``)
drives Klampt's interactive OpenGL viewer (C++); that dependency is out of
scope for a TPU serving stack (SURVEY.md §2.4), so this module provides the
same *demos* — ``visualize_fk``, ``oscillate_latent``, ``oscillate_target``,
``oscillate_joints`` (reference lines ``:108``, ``:142``, ``:214``, ``:323``) —
as headless matplotlib renders (PNG frames / GIF animations) driven by the
batched FK path. All solver computation stays batched: a whole animation's
solutions are generated in ONE device call, then drawn.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

# Per-robot demo target poses, mirroring the reference's table
# (visualizations.py:20-39).
_TARGET_POSE_FUNCS = {
    "panda": np.array([0.25, 0.65, 0.45, 1.0, 0.0, 0.0, 0.0]),
    "fetch": np.array([0.45, 0.65, 0.55, 1.0, 0.0, 0.0, 0.0]),
    "fetch_arm": np.array([0.45, 0.65, 0.55, 1.0, 0.0, 0.0, 0.0]),
    "rizon4": np.array([0.3, 0.5, 0.4, 1.0, 0.0, 0.0, 0.0]),
}


def demo_target_pose(robot_name: str) -> np.ndarray:
    return _TARGET_POSE_FUNCS.get(robot_name, np.array([0.3, 0.4, 0.4, 1.0, 0, 0, 0]))


def _skeleton_points(robot, q: np.ndarray) -> np.ndarray:
    """Joint-origin polyline for one config (L+1, 3)."""
    import jax.numpy as jnp

    Rs, ps = robot.fk_frames(jnp.asarray(q[None]))
    pts = np.asarray(ps)[0]  # (L, 3)
    return np.concatenate([np.zeros((1, 3)), pts], axis=0)


def _setup_ax(ax, robot_name: str):
    ax.set_xlim(-1, 1)
    ax.set_ylim(-1, 1)
    ax.set_zlim(0, 1.4)
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    ax.set_title(robot_name)


def visualize_fk(robot, n_configs: int = 6, out_path: str = "fk_visualization.png", seed: int = 0):
    """Render n random configurations' skeletons (parity: ``visualize_fk``,
    ``visualizations.py:108-139``)."""
    import jax
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    q = np.asarray(robot.sample_joint_angles(jax.random.PRNGKey(seed), n_configs))
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    _setup_ax(ax, robot.name)
    for i in range(n_configs):
        pts = _skeleton_points(robot, q[i])
        ax.plot(pts[:, 0], pts[:, 1], pts[:, 2], "-o", markersize=3, alpha=0.8)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def oscillate_latent(
    solver,
    target_pose: Optional[np.ndarray] = None,
    n_frames: int = 60,
    out_path: str = "oscillate_latent.gif",
    latent_scale: float = 1.0,
    fps: int = 15,
):
    """Fixed pose, sweep one latent dimension sinusoidally; animate the
    resulting solution family (parity: ``oscillate_latent``,
    ``visualizations.py:142-210``). All frames solved in one batched call."""
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    robot = solver.robot
    if target_pose is None:
        target_pose = demo_target_pose(robot.name)
    D = solver.network_width
    t = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    latents = np.zeros((n_frames, D), dtype=np.float32)
    for d in range(D):
        latents[:, d] = latent_scale * np.sin(t + 2 * np.pi * d / D)
    sols = np.asarray(
        solver.generate_ik_solutions(
            jnp.broadcast_to(jnp.asarray(target_pose, jnp.float32), (n_frames, 7)),
            latent=jnp.asarray(latents),
            allow_uninitialized=True,
        )
    )

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")

    def draw(i):
        ax.clear()
        _setup_ax(ax, f"{robot.name} — latent sweep")
        pts = _skeleton_points(robot, sols[i])
        ax.plot(pts[:, 0], pts[:, 1], pts[:, 2], "-o", markersize=4)
        ax.scatter(*target_pose[:3], color="red", s=60, marker="*")
        return []

    ani = animation.FuncAnimation(fig, draw, frames=n_frames)
    ani.save(out_path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return out_path


def oscillate_target(
    solver,
    n_solutions: int = 5,
    n_frames: int = 60,
    radius: float = 0.15,
    out_path: str = "oscillate_target.gif",
    fixed_latent: bool = True,
    fps: int = 15,
    seed: int = 0,
):
    """Moving target pose with n solutions per frame (parity:
    ``oscillate_target``, ``visualizations.py:214-284``)."""
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    robot = solver.robot
    base = demo_target_pose(robot.name)
    t = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    poses = np.tile(base, (n_frames, 1)).astype(np.float32)
    poses[:, 0] += radius * np.cos(t)
    poses[:, 2] += radius * np.sin(t)

    poses_tiled = np.repeat(poses, n_solutions, axis=0)
    if fixed_latent:
        latent_row = np.asarray(
            jax.random.normal(jax.random.PRNGKey(seed), (n_solutions, solver.network_width))
        )
        latent = jnp.asarray(np.tile(latent_row, (n_frames, 1)), jnp.float32)
    else:
        latent = None
    sols = np.asarray(
        solver.generate_ik_solutions(
            jnp.asarray(poses_tiled), latent=latent, key=jax.random.PRNGKey(seed),
            allow_uninitialized=True,
        )
    ).reshape(n_frames, n_solutions, robot.ndof)

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")

    def draw(i):
        ax.clear()
        _setup_ax(ax, f"{robot.name} — target sweep")
        for j in range(n_solutions):
            pts = _skeleton_points(robot, sols[i, j])
            ax.plot(pts[:, 0], pts[:, 1], pts[:, 2], "-o", markersize=3, alpha=0.7)
        ax.scatter(*poses[i, :3], color="red", s=60, marker="*")
        return []

    ani = animation.FuncAnimation(fig, draw, frames=n_frames)
    ani.save(out_path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return out_path


def oscillate_joints(robot, n_frames: int = 60, out_path: str = "oscillate_joints.gif", fps: int = 15):
    """Sweep each joint between its limits (parity: ``oscillate_joints``,
    ``visualizations.py:323-373``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    low = np.array([lim[0] for lim in robot.actuated_joints_limits])
    high = np.array([lim[1] for lim in robot.actuated_joints_limits])
    t = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    alpha = 0.5 * (1 + np.sin(t))[:, None]
    qs = low + alpha * (high - low)

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")

    def draw(i):
        ax.clear()
        _setup_ax(ax, f"{robot.name} — joint sweep")
        pts = _skeleton_points(robot, qs[i].astype(np.float32))
        ax.plot(pts[:, 0], pts[:, 1], pts[:, 2], "-o", markersize=4)
        return []

    ani = animation.FuncAnimation(fig, draw, frames=n_frames)
    ani.save(out_path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return out_path
