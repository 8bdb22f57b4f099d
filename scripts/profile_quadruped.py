"""Component-level timing of the ANYmal trajectory task on the real chip.

The quadruped (nj=12) PPO iteration is the weakest headline number
(347.9 ms/iter = 283k env-steps/s vs 1.6M on the hopper, docs/PERF.md).
This times each piece of env.step — bare substep, decimated sim step,
trajectory-generator tick, contact forces, rewards, observations, reset
path, full env.step — plus the PPO update alone, to localize it.

Usage: python scripts/profile_quadruped.py [batch] [task]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax_leaf(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax_leaf(out))
    return (time.perf_counter() - t0) / n


def jax_leaf(tree):
    import jax

    leaves = [l for l in jax.tree.leaves(tree)
              if hasattr(l, "ravel") and l.size]
    return leaves[0].ravel()[:1]


def main():
    from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

    setup_tpu_runtime()
    import jax
    import jax.numpy as jnp

    from legged_gym_dev_tpu.envs import task_registry

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    task = sys.argv[2] if len(sys.argv) > 2 else "anymal_c_trajectory"
    print(f"platform={jax.devices()[0].platform} B={B} task={task}", flush=True)

    env = task_registry.make_env(task, num_envs=B)
    sim = env.sim
    model = sim.model
    key = jax.random.PRNGKey(0)
    st, obs = env.reset(key)
    robot = st.robot
    tau = jnp.zeros((B, model.nj))
    act = jnp.zeros((B, model.nj))

    ss = jax.jit(sim.substep)
    sstep = jax.jit(lambda s, t: sim.step_with_carry(
        s, jnp.zeros((B, model.nj)), lambda c, rs: (t, t))[0])

    tgen = env._traj_gen_cur(st)
    tg_step = jax.jit(lambda tg: tgen.step(tg))
    tg_win = jax.jit(lambda tg: tgen.get_trajectory(tg))

    cf = jax.jit(lambda r: env._contact_forces(r, sim))
    f_contact = cf(robot)
    feet = jnp.asarray(env.feet_spheres, jnp.int32)
    contact = f_contact[:, feet, 2] > 1.0
    first_contact = (st.feet_air_time > 0.0) & contact
    air = st.feet_air_time + env.dt
    term_idx = jnp.asarray(env.termination_spheres, jnp.int32)
    term_contact = jnp.any(
        jnp.linalg.norm(f_contact[:, term_idx, :], axis=-1) > 1.0, axis=-1
    ) if env.termination_spheres else jnp.zeros((B,), bool)

    rw = jax.jit(lambda s, r, f: env._rewards(
        s, r, f, term_contact, first_contact.astype(jnp.float32), air))
    ob = jax.jit(env._obs)
    rst = jax.jit(lambda s: env._do_reset(s, jnp.zeros((B,), bool)))
    estep = jax.jit(env.step)

    for name, f, args, per in [
        ("substep", ss, (robot, tau), "substeps"),
        ("sim.step(x4)", sstep, (robot, tau), "steps"),
        ("trajgen.step", tg_step, (st.traj_gen,), "steps"),
        ("trajgen.window", tg_win, (st.traj_gen,), "steps"),
        ("contact_forces", cf, (robot,), "steps"),
        ("rewards", rw, (st, robot, f_contact), "steps"),
        ("obs", ob, (st,), "steps"),
        ("do_reset(none)", rst, (st,), "steps"),
        ("env.step", estep, (st, act), "steps"),
    ]:
        dt = timeit(f, *args, n=10)
        print(f"{name:16s} {dt*1e3:8.3f} ms  ({B/dt/1e3:9.1f} k{per}/s)",
              flush=True)

    # Full fused learn iteration (rollout + GAE + update); env.step timing
    # above lets the update share be inferred as iter - 24 x step.
    from legged_gym_dev_tpu.rl import ActorCritic, PPOConfig
    from legged_gym_dev_tpu.rl.ppo import init_train_state, make_learn_iteration

    cfg = PPOConfig()
    ac = ActorCritic(num_actions=env.num_actions)
    ts = init_train_state(ac, env.num_obs, cfg, jax.random.PRNGKey(1))
    learn = make_learn_iteration(env, ac, cfg)

    def one_iter(t, s):
        t2, s2, metrics = learn(t, s)
        return metrics["mean_reward"]

    dt = timeit(one_iter, ts, st, n=5)
    steps = B * cfg.num_steps
    print(f"{'learn_iteration':16s} {dt*1e3:8.3f} ms  "
          f"({steps/dt/1e3:9.1f} kenv-steps/s)", flush=True)


if __name__ == "__main__":
    main()
