"""Component-level timing of the rigid-body sim hot path on the real chip.

Times each piece of the hopper substep (contact kinematics, mass matrix,
bias forces, full forward dynamics, substep, decimated step, full env step)
at training batch size, to localize where the ~20k env-steps/s (PERF.md)
goes. Timing forces completion with a host transfer (block_until_ready is
unreliable on the remote backend).

Usage: python scripts/profile_sim.py [batch]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=2):
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

    leaves = jax.tree.leaves(tree)
    return leaves[0].ravel()[:1]


def main():
    from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

    setup_tpu_runtime()
    import jax
    import jax.numpy as jnp

    from legged_gym_dev_tpu.envs.presets import make_hopper_trajectory_env
    from legged_gym_dev_tpu.sim import dynamics as dyn

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    print(f"platform={jax.devices()[0].platform} B={B}")

    env = make_hopper_trajectory_env(num_envs=B)
    sim = env.sim
    model = sim.model
    key = jax.random.PRNGKey(0)
    st = env.reset(key)
    if isinstance(st, tuple):
        st = st[0]
    robot = st.robot
    tau = jnp.zeros((B, model.nj))

    mm = jax.jit(lambda s: dyn.mass_matrix(model, s))
    bf = jax.jit(lambda s: dyn.bias_forces(model, s))
    ck = jax.jit(lambda s: dyn.contact_kinematics(model, s))
    fd = jax.jit(lambda s, t: dyn.forward_dynamics(
        model, s, t, jnp.zeros((B, 6 + model.nj))))
    ss = jax.jit(lambda s, t: sim.substep(s, t))

    for name, f, args in [
        ("mass_matrix", mm, (robot,)),
        ("bias_forces", bf, (robot,)),
        ("contact_kin", ck, (robot,)),
        ("forward_dyn", fd, (robot, tau)),
        ("substep", ss, (robot, tau)),
    ]:
        dt = timeit(f, *args)
        print(f"{name:14s} {dt*1e3:8.3f} ms  ({B/dt/1e6:8.2f} M/s)")

    # Full env step (policy-rate): decimation x substeps + obs/rew.
    act = jnp.zeros((B, 4)).at[:, 0].set(1.0)
    estep = jax.jit(env.step)
    dt = timeit(estep, st, act, n=10)
    print(f"{'env.step':14s} {dt*1e3:8.3f} ms  ({B/dt:10.0f} env-steps/s)")


if __name__ == "__main__":
    main()
