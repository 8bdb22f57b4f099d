"""Attribute the rough-terrain slowdown (round-5 VERDICT item 2).

Rough `anymal_c_rough` trained at 41k steps/s vs 1.6-2.1M on flat
(docs/PERF.md round 4). Suspects: the per-substep per-contact-point
heightfield queries (bilinear gather + autodiff gradient,
sim/contact.py:53-59) and the 187-point perceptive height scan
(utils/terrain.py height_scan). This script times each in isolation on
chip so the optimization lands on the measured bottleneck.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=10, warm=3):
    import jax
    out = fn(*args)
    jax.tree.util.tree_map(np.asarray, out)
    for _ in range(warm - 1):
        out = fn(*args)
    jax.tree.util.tree_map(np.asarray, out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.util.tree_map(np.asarray, out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

    setup_tpu_runtime()
    import jax
    import jax.numpy as jnp

    from legged_gym_dev_tpu import envs  # noqa: F401
    from legged_gym_dev_tpu.envs import task_registry
    from legged_gym_dev_tpu.sim.contact import contact_forces, flat_terrain
    from legged_gym_dev_tpu.sim.dynamics import contact_kinematics
    from legged_gym_dev_tpu.utils.terrain import height_scan

    B = int(os.environ.get("ENVS", "2048"))
    env = task_registry.make_env("anymal_c_rough", num_envs=B)
    envf = task_registry.make_env("anymal_c", num_envs=B)
    key = jax.random.PRNGKey(0)
    es, _ = jax.jit(env.reset)(key)
    esf, _ = jax.jit(envf.reset)(key)
    act = jnp.zeros((B, 12))
    nc = env.sim.model.contact_radius.shape[0]
    print(f"B={B} nc={nc} hf={env.sim.terrain_fn.__name__ if hasattr(env.sim.terrain_fn, '__name__') else 'heightfield'}",
          flush=True)

    # 1. full env policy step: rough vs flat
    step_r = jax.jit(lambda s: env.step(s, act)[0])
    step_f = jax.jit(lambda s: envf.step(s, act)[0])
    t_r = timed(step_r, es)
    t_f = timed(step_f, esf)
    print(f"env.step rough {t_r*1e3:.2f} ms  flat {t_f*1e3:.2f} ms  "
          f"ratio {t_r/t_f:.1f}x  (rough {B/t_r:.0f} steps/s)", flush=True)

    # 2. height scan alone (policy rate, 187 pts)
    hs = jax.jit(lambda r: height_scan(
        env.sim.terrain_fn, r.base_pos, r.base_quat,
        env.measured_points_x, env.measured_points_y))
    t_hs = timed(hs, es.robot)
    print(f"height_scan(187pt) {t_hs*1e3:.2f} ms/call", flush=True)

    # 3. contact query alone at substep scale: rough vs flat terrain_fn
    pos, vel, _ = contact_kinematics(env.sim.model, es.robot)
    cf_r = jax.jit(lambda p, v: contact_forces(
        env.sim.contact, p, v, env.sim.model.contact_radius,
        env.sim.terrain_fn))
    cf_f = jax.jit(lambda p, v: contact_forces(
        env.sim.contact, p, v, env.sim.model.contact_radius, flat_terrain))
    t_cr = timed(cf_r, pos, vel)
    t_cf = timed(cf_f, pos, vel)
    print(f"contact_forces rough {t_cr*1e3:.2f} ms  flat {t_cf*1e3:.2f} ms "
          f"(x4 substeps = {4*t_cr*1e3:.2f} ms/policy-step)", flush=True)

    # 4. substep alone: rough vs flat
    tau = jnp.zeros((B, 12))
    ss_r = jax.jit(lambda s: env.sim.substep(s, tau))
    ss_f = jax.jit(lambda s: envf.sim.substep(s, tau))
    t_sr = timed(ss_r, es.robot)
    t_sf = timed(ss_f, esf.robot)
    print(f"substep rough {t_sr*1e3:.2f} ms  flat {t_sf*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
