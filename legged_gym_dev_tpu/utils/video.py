"""Headless rollout video rendering (mp4/gif).

The reference's ``play.py`` records camera frames from the Isaac Gym
viewer (ref: legged_gym/scripts/play.py:88-110) and ``base_task.render``
drives an interactive window (ref: base_task.py:120-148). Isaac Gym is
GPU/desktop-bound; the TPU-native equivalent renders offline with
``mujoco.Renderer`` over the framework's own MJCF export
(sim/mjcf.build_mjcf_from_model(visual=True)): roll the JAX env, record
the robot state trace, then replay it through MuJoCo's kinematics for
frames. Physics stays 100% in the JAX sim — MuJoCo is a renderer here
(``mj_forward`` only, no stepping).

Output: ``.mp4`` via OpenCV when the path ends in .mp4 (no ffmpeg needed),
else ``.gif`` via imageio.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def _quat_xyzw_to_wxyz(q):
    return np.asarray([q[3], q[0], q[1], q[2]])


def render_state_trace(model, base_pos: np.ndarray, base_quat: np.ndarray,
                       q: np.ndarray, out_path: str, fps: float = 50.0,
                       width: int = 640, height: int = 480,
                       cam_distance: float = 2.5) -> str:
    """Render a recorded state trace to a video file.

    model: sim.dynamics.RobotModel;  base_pos (T, 3);  base_quat (T, 4)
    in the framework's xyzw convention;  q (T, nj).
    """
    import os

    # Headless GL: this image has Mesa's EGL but no display/device platform;
    # the surfaceless platform makes eglInitialize succeed (probed: swrast
    # renders fine). Must be set before the first mujoco.Renderer.
    os.environ.setdefault("MUJOCO_GL", "egl")
    os.environ.setdefault("EGL_PLATFORM", "surfaceless")
    import mujoco

    from ..sim.mjcf import build_mjcf_from_model

    m = mujoco.MjModel.from_xml_string(
        build_mjcf_from_model(model, visual=True))
    d = mujoco.MjData(m)
    renderer = mujoco.Renderer(m, height=height, width=width)
    cam = mujoco.MjvCamera()
    mujoco.mjv_defaultFreeCamera(m, cam)
    cam.distance = cam_distance
    cam.elevation = -15.0
    cam.azimuth = 135.0

    # Map framework dof order -> MuJoCo qpos via joint NAMES (same as
    # evaluation.py's sim2sim addressing): MuJoCo's qpos document order is
    # a DFS over the MJCF body tree, which need not match the framework's
    # dof index order for robots whose URDF joint numbering is not
    # DFS-consistent; positional d.qpos[7:] = q[t] would silently permute
    # joints in the rendered pose.
    qadr = {m.joint(i).name: int(m.joint(i).qposadr[0])
            for i in range(m.njnt)}
    dof_adr = [qadr[name] for name in model.dof_names]

    T = base_pos.shape[0]
    frames = []
    for t in range(T):
        d.qpos[:3] = base_pos[t]
        d.qpos[3:7] = _quat_xyzw_to_wxyz(base_quat[t])
        for j, adr in enumerate(dof_adr):
            d.qpos[adr] = q[t, j]
        mujoco.mj_forward(m, d)
        cam.lookat[:] = base_pos[t]  # tracking camera
        renderer.update_scene(d, camera=cam)
        frames.append(renderer.render().copy())
    renderer.close()
    return write_video(frames, out_path, fps)


def write_video(frames, out_path: str, fps: float) -> str:
    if out_path.endswith(".mp4"):
        import cv2

        h, w = frames[0].shape[:2]
        vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
        if not vw.isOpened():  # codec unavailable -> gif fallback
            vw.release()
            return write_video(frames, out_path[:-4] + ".gif", fps)
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
        return out_path
    import imageio

    if not out_path.endswith(".gif"):
        out_path += ".gif"
    imageio.mimsave(out_path, frames, duration=1.0 / fps, loop=0)
    return out_path


def record_rollout_video(env, policy: Callable, key, steps: int,
                         out_path: str, env_index: int = 0,
                         fps: Optional[float] = None,
                         width: int = 640, height: int = 480) -> str:
    """Roll ``env`` with ``policy`` and render ``env_index``'s trajectory.

    Works for every rigid-body task (state pytree carries ``.robot``);
    raises for physics-free envs (rom_tracking) which have nothing to
    render in 3D.
    """
    import jax

    state, obs = env.reset(key)
    if not hasattr(state, "robot"):
        raise ValueError(
            f"{type(env).__name__} has no rigid-body state to render "
            "(physics-free ROM env); use the logger dashboard instead")

    step = jax.jit(env.step)
    pos, quat, qs = [], [], []
    for _ in range(steps):
        r = state.robot
        pos.append(np.asarray(r.base_pos[env_index]))
        quat.append(np.asarray(r.base_quat[env_index]))
        qs.append(np.asarray(r.q[env_index]))
        state, tr = step(state, policy(obs))
        obs = tr.obs
    return render_state_trace(
        env.sim.model, np.stack(pos), np.stack(quat), np.stack(qs),
        out_path, fps=fps or (1.0 / env.dt), width=width, height=height,
    )
