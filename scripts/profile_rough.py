"""Attribute the rough-terrain slowdown (round-5 VERDICT item 2).

Rough `anymal_c_rough` trained at 41k steps/s vs 1.6-2.1M on flat
(docs/PERF.md round 4). Times a 50-policy-step scan INSIDE one jit with a
scalar output (full-state fetches over the remote tunnel would swamp
compute; the carried env state keeps every step live against DCE), for:
  - rough vs flat full env steps,
  - rough with the height scan disabled (isolates the 187-pt scan),
  - flat with the Pallas substep forced off (isolates the kernel-vs-
    fallback gap the rough path pays).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 50  # policy steps per timed call


def timed_scan(env, es, act, reps=5):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(es):
        def body(s, _):
            s, tr = env.step(s, act)
            return s, None
        es, _ = jax.lax.scan(body, es, None, length=K)
        return jnp.sum(es.robot.base_pos[:, 2])

    out = run(es)
    np.asarray(out)
    for _ in range(2):
        out = run(es)
    np.asarray(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(es)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) / K


def main():
    from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

    setup_tpu_runtime()
    import jax
    import jax.numpy as jnp

    from legged_gym_dev_tpu import envs  # noqa: F401
    from legged_gym_dev_tpu.envs import task_registry

    B = int(os.environ.get("ENVS", "2048"))
    env = task_registry.make_env("anymal_c_rough", num_envs=B)
    envf = task_registry.make_env("anymal_c_velocity", num_envs=B)
    env_noscan = env.replace(measured_points_x=None, measured_points_y=None,
                             noise_vec=envf.noise_vec)
    envf_noker = envf.replace(sim=envf.sim.replace(use_pallas_substep=False))
    key = jax.random.PRNGKey(0)
    act = jnp.zeros((B, 12))
    nc = env.sim.model.contact_radius.shape[0]

    es, _ = jax.jit(env.reset)(key)
    esf, _ = jax.jit(envf.reset)(key)
    esn, _ = jax.jit(env_noscan.reset)(key)

    t_f = timed_scan(envf, esf, act)
    print(f"flat (pallas substep): {t_f*1e3:.2f} ms/step "
          f"({B/t_f:.0f} steps/s)", flush=True)
    t_fn = timed_scan(envf_noker, esf, act)
    print(f"flat (XLA fallback):   {t_fn*1e3:.2f} ms/step "
          f"({B/t_fn:.0f} steps/s)", flush=True)
    t_n = timed_scan(env_noscan, esn, act)
    print(f"rough, no height scan: {t_n*1e3:.2f} ms/step "
          f"({B/t_n:.0f} steps/s)", flush=True)
    t_r = timed_scan(env, es, act)
    print(f"rough (full):          {t_r*1e3:.2f} ms/step "
          f"({B/t_r:.0f} steps/s)  [nc={nc}]", flush=True)
    print(f"attribution: scan {1e3*(t_r-t_n):.2f} ms, terrain-in-contact "
          f"{1e3*(t_n-t_fn):.2f} ms, kernel-vs-fallback "
          f"{1e3*(t_fn-t_f):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
