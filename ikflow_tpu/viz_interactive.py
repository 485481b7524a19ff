"""Interactive 3-D visualization: self-contained HTML export.

The reference's interactive layer is Klampt's OpenGL viewer
(``/root/reference/ikflow/visualizations.py`` — C++/Qt, out of scope for a TPU
serving stack). This module provides the interactive-3D capability without any
runtime dependency: all FK is computed batched in Python (one device call per
demo), and the result is written as ONE self-contained ``.html`` file — a
vanilla-JS orbit renderer (mouse-drag rotate, wheel zoom, play/pause + frame
scrubber) that draws the robot's measured collision capsules with painter's-
algorithm depth sorting. Works offline in any browser; no CDN, no three.js.

Demos mirror the reference's set: ``interactive_fk`` (random configs),
``interactive_oscillate_latent`` (fixed pose, swept latent —
``visualizations.py:142``), ``interactive_oscillate_target`` (moving pose —
``visualizations.py:214``).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>__TITLE__</title>
<style>
 body { margin:0; background:#10141a; color:#cfd8e3; font:13px system-ui, sans-serif; }
 #hud { position:fixed; top:10px; left:12px; user-select:none; }
 #hud h1 { font-size:15px; margin:0 0 4px 0; color:#e8eef5; }
 #controls { position:fixed; bottom:12px; left:12px; right:12px; display:flex;
             gap:10px; align-items:center; }
 #frame { flex:1; }
 button { background:#2a3442; color:#e8eef5; border:0; border-radius:4px;
          padding:5px 14px; cursor:pointer; }
 canvas { display:block; }
</style></head><body>
<canvas id="c"></canvas>
<div id="hud"><h1>__TITLE__</h1>
<div>drag: orbit &nbsp; wheel: zoom &nbsp; __SUBTITLE__</div>
<div id="info"></div></div>
<div id="controls">
 <button id="play">&#9658;</button>
 <input type="range" id="frame" min="0" max="0" value="0" step="1">
 <span id="flabel"></span>
</div>
<script>
const DATA = __DATA__;
const cv = document.getElementById('c'), ctx = cv.getContext('2d');
let W, H; function resize(){ W = cv.width = innerWidth; H = cv.height = innerHeight; }
resize(); addEventListener('resize', () => { resize(); draw(); });
let yaw = 0.9, pitch = 0.35, dist = 2.6, frame = 0, playing = true;
const center = DATA.center;
function proj(p){
  const cy = Math.cos(yaw), sy = Math.sin(yaw), cp = Math.cos(pitch), sp = Math.sin(pitch);
  const x0 = p[0]-center[0], y0 = p[1]-center[1], z0 = p[2]-center[2];
  const x1 = cy*x0 + sy*y0, y1 = -sy*x0 + cy*y0;         // yaw about +z
  const y2 = cp*y1 - sp*z0, z2 = sp*y1 + cp*z0;          // pitch
  const d = dist - y2;                                    // camera on -y axis
  const f = 0.9 * Math.min(W, H) / Math.max(d, 0.05);
  return [W/2 + f*x1, H*0.54 - f*z2, d, f];
}
function capsule2d(a, b, r, color, alpha){
  const pa = proj(a), pb = proj(b);
  ctx.globalAlpha = alpha;
  ctx.strokeStyle = color; ctx.fillStyle = color;
  ctx.lineWidth = Math.max(1, r * (pa[3] + pb[3]));
  ctx.lineCap = 'round';
  ctx.beginPath(); ctx.moveTo(pa[0], pa[1]); ctx.lineTo(pb[0], pb[1]); ctx.stroke();
  return (pa[2] + pb[2]) / 2;
}
function drawAxes(){
  const O = [0,0,0];
  for (const [v, col] of [[[0.25,0,0],'#e05d5d'], [[0,0.25,0],'#57c27a'], [[0,0,0.25],'#5d8de0']]){
    const po = proj(O), pv = proj(v);
    ctx.globalAlpha = 0.9; ctx.strokeStyle = col; ctx.lineWidth = 2;
    ctx.beginPath(); ctx.moveTo(po[0], po[1]); ctx.lineTo(pv[0], pv[1]); ctx.stroke();
  }
}
function draw(){
  ctx.globalAlpha = 1; ctx.fillStyle = '#10141a'; ctx.fillRect(0, 0, W, H);
  drawAxes();
  const fr = DATA.frames[frame];
  const items = [];
  fr.sols.forEach((caps, si) => {
    const col = DATA.colors[si % DATA.colors.length];
    caps.forEach(c => items.push({a:c[0], b:c[1], r:c[2], col:col,
                                  alpha: fr.sols.length > 1 ? 0.75 : 0.95}));
  });
  // painter's algorithm: far first
  items.map(it => ({it, d: (proj(it.a)[2] + proj(it.b)[2]) / 2}))
       .sort((x, y) => y.d - x.d)
       .forEach(({it}) => capsule2d(it.a, it.b, it.r, it.col, it.alpha));
  if (fr.target){
    const pt = proj(fr.target);
    ctx.globalAlpha = 1; ctx.strokeStyle = '#ffd166'; ctx.lineWidth = 2;
    ctx.beginPath(); ctx.arc(pt[0], pt[1], 7, 0, 6.283); ctx.stroke();
    ctx.beginPath(); ctx.arc(pt[0], pt[1], 1.5, 0, 6.283); ctx.stroke();
  }
  document.getElementById('flabel').textContent = (frame+1) + '/' + DATA.frames.length;
  document.getElementById('info').textContent = fr.label || '';
}
let dragging = false, lx = 0, ly = 0;
cv.addEventListener('mousedown', e => { dragging = true; lx = e.clientX; ly = e.clientY; });
addEventListener('mouseup', () => dragging = false);
addEventListener('mousemove', e => {
  if (!dragging) return;
  yaw += (e.clientX - lx) * 0.008; pitch += (e.clientY - ly) * 0.008;
  pitch = Math.max(-1.4, Math.min(1.4, pitch));
  lx = e.clientX; ly = e.clientY; draw();
});
cv.addEventListener('wheel', e => { dist *= Math.exp(e.deltaY * 0.001); draw(); e.preventDefault(); });
const slider = document.getElementById('frame');
slider.max = DATA.frames.length - 1;
slider.addEventListener('input', () => { frame = +slider.value; playing = false; draw(); });
document.getElementById('play').addEventListener('click', () => playing = !playing);
setInterval(() => {
  if (playing && DATA.frames.length > 1){
    frame = (frame + 1) % DATA.frames.length; slider.value = frame; draw();
  }
}, 1000 / DATA.fps);
draw();
</script></body></html>
"""

_COLORS = ["#6ec6ff", "#ffb74d", "#aed581", "#f48fb1", "#b39ddb", "#80cbc4",
           "#fff176", "#ff8a65", "#90caf9", "#c5e1a5"]


def _capsules_world(robot, q: np.ndarray):
    """[(p0, p1, r), ...] world-frame capsules for one config (host numpy)."""
    pts = robot._capsule_endpoints_np(np.asarray(q, dtype=np.float64))
    return [
        [list(np.round(a, 4)), list(np.round(b, 4)), float(cap.radius)]
        for (a, b), cap in zip(pts, robot.capsules)
    ]


def _write(out_path: str, title: str, subtitle: str, frames, fps: int, center) -> str:
    payload = {
        "frames": frames,
        "fps": fps,
        "colors": _COLORS,
        "center": [float(c) for c in center],
    }
    html = (
        _HTML_TEMPLATE
        .replace("__TITLE__", title)
        .replace("__SUBTITLE__", subtitle)
        .replace("__DATA__", json.dumps(payload))
    )
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(html)
    return out_path


def interactive_fk(robot, n_configs: int = 5, out_path: str = "fk_interactive.html",
                   seed: int = 0) -> str:
    """Random configurations as an orbitable 3-D scene (one per frame)."""
    import jax

    q = np.asarray(robot.sample_joint_angles(jax.random.PRNGKey(seed), n_configs))
    frames = [
        {"sols": [_capsules_world(robot, qi)], "label": f"config {i + 1}"}
        for i, qi in enumerate(q)
    ]
    return _write(out_path, f"{robot.name} — forward kinematics", "frames: random configs",
                  frames, fps=1, center=(0, 0, 0.5))


def interactive_oscillate_latent(
    solver, target_pose: Optional[np.ndarray] = None, n_frames: int = 72,
    out_path: str = "oscillate_latent_interactive.html",
    allow_uninitialized: bool = False,
) -> str:
    """Fixed target pose, latent swept on a closed loop — every frame is one
    solution of the SAME pose (parity: ``oscillate_latent``,
    ``visualizations.py:142``). All FK/flow work happens in one batched call.
    """
    import jax
    import jax.numpy as jnp

    from ikflow_tpu.visualization import demo_target_pose

    robot = solver.robot
    if target_pose is None:
        target_pose = demo_target_pose(robot.name)
    ts = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    latents = np.zeros((n_frames, solver.network_width), dtype=np.float32)
    latents[:, 0] = 1.2 * np.cos(ts)
    latents[:, 1] = 1.2 * np.sin(ts)
    poses = jnp.tile(jnp.asarray(target_pose, jnp.float32)[None], (n_frames, 1))
    q = np.asarray(solver.generate_ik_solutions(
        poses, latent=jnp.asarray(latents), allow_uninitialized=allow_uninitialized
    ))
    frames = [
        {"sols": [_capsules_world(robot, qi)], "target": list(map(float, target_pose[:3])),
         "label": f"latent phase {t:.2f} rad"}
        for t, qi in zip(ts, q)
    ]
    return _write(out_path, f"{robot.name} — oscillate latent",
                  "fixed pose, latent swept on a circle", frames, fps=12,
                  center=(0, 0, 0.5))


def interactive_oscillate_joints(
    robot, n_frames: int = 72, out_path: str = "oscillate_joints_interactive.html",
) -> str:
    """Every joint swept sinusoidally through its limits, phase-offset per
    joint (parity: ``oscillate_joints``, ``visualizations.py:323``)."""
    ts = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    low = np.asarray(robot.limits_low(), dtype=np.float64)
    high = np.asarray(robot.limits_high(), dtype=np.float64)
    mid, amp = 0.5 * (low + high), 0.5 * (high - low)
    frames = []
    for i, t in enumerate(ts):
        phases = t + 2 * np.pi * np.arange(robot.ndof) / robot.ndof
        q = mid + amp * np.sin(phases)
        frames.append({"sols": [_capsules_world(robot, q)],
                       "label": f"joint sweep phase {t:.2f} rad"})
    return _write(out_path, f"{robot.name} — oscillate joints",
                  "all joints swept through their limits", frames, fps=12,
                  center=(0, 0, 0.5))


def interactive_oscillate_target(
    solver, n_frames: int = 72, n_solutions: int = 6,
    out_path: str = "oscillate_target_interactive.html",
    allow_uninitialized: bool = False,
) -> str:
    """Target pose swept on a closed loop, k solutions per frame with FIXED
    latents (parity: ``oscillate_target``, ``visualizations.py:214``)."""
    import jax
    import jax.numpy as jnp

    from ikflow_tpu.visualization import demo_target_pose

    robot = solver.robot
    base = demo_target_pose(robot.name)
    ts = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    targets = np.tile(base[None], (n_frames, 1)).astype(np.float32)
    targets[:, 0] += 0.15 * np.cos(ts)
    targets[:, 1] += 0.15 * np.sin(ts)
    # k fixed latents x n_frames poses, one batched call.
    lat1 = np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), (n_solutions, solver.network_width)),
        dtype=np.float32,
    )
    poses_t = np.repeat(targets, n_solutions, axis=0)
    lats_t = np.tile(lat1, (n_frames, 1))
    q = np.asarray(solver.generate_ik_solutions(
        jnp.asarray(poses_t), latent=jnp.asarray(lats_t),
        allow_uninitialized=allow_uninitialized,
    )).reshape(n_frames, n_solutions, -1)
    frames = [
        {"sols": [_capsules_world(robot, qk) for qk in qf],
         "target": list(map(float, targets[i, :3])),
         "label": f"{n_solutions} solutions, fixed latents"}
        for i, qf in enumerate(q)
    ]
    return _write(out_path, f"{robot.name} — oscillate target",
                  "moving pose, fixed latents", frames, fps=12, center=(0, 0, 0.5))
