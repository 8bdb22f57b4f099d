"""Parity of the single-kernel Pallas substep vs the XLA scalar-graph path
(interpret mode on CPU; the real-chip A/B lives in scripts/)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.envs import task_registry
from legged_gym_dev_tpu.ops.pallas_substep import (
    pallas_substep,
    supports_pallas,
)


@pytest.mark.parametrize("task", ["hopper_trajectory", "anymal_c_trajectory"])
def test_pallas_substep_parity(task):
    B = 64
    env = task_registry.make_env(task, num_envs=B)
    sim = env.sim
    model = sim.model
    assert supports_pallas(sim)

    rng = np.random.default_rng(0)
    st = sim.default_state(B)
    st = st.replace(
        base_pos=st.base_pos + jnp.asarray(
            rng.normal(0, 0.05, (B, 3)), jnp.float32),
        q=st.q + jnp.asarray(rng.normal(0, 0.1, st.q.shape), jnp.float32),
        v=jnp.asarray(rng.normal(0, 0.3, st.v.shape), jnp.float32),
    )
    tau = jnp.asarray(rng.normal(0, 3.0, (B, model.nj)), jnp.float32)

    ref = sim.substep(st, tau)
    out = pallas_substep(sim, st, tau, block=32, interpret=True)
    for name in ("base_pos", "base_quat", "q", "v"):
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(out, name))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5, err_msg=name)


def test_pallas_substep_dr_params():
    """Per-env contact DR + base payload mass ride in as value rows."""
    B = 32
    env = task_registry.make_env("anymal_c_trajectory", num_envs=B)
    sim = env.sim
    rng = np.random.default_rng(1)
    sim = sim.replace(
        contact=sim.contact.replace(
            friction=jnp.asarray(rng.uniform(0.5, 1.2, (B, 1, 1)),
                                 jnp.float32),
            stiffness=sim.contact.stiffness
            * jnp.asarray(rng.uniform(0.8, 1.2, (B, 1)), jnp.float32),
        ),
        base_mass_delta=jnp.asarray(rng.uniform(-1, 1, (B,)), jnp.float32),
    )
    st = sim.default_state(B)
    st = st.replace(v=jnp.asarray(rng.normal(0, 0.3, st.v.shape), jnp.float32))
    tau = jnp.asarray(rng.normal(0, 3.0, (B, sim.model.nj)), jnp.float32)

    ref = sim.substep(st, tau)
    out = pallas_substep(sim, st, tau, block=32, interpret=True)
    for name in ("base_pos", "base_quat", "q", "v"):
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(out, name))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5, err_msg=name)


def test_pallas_unsupported_falls_back():
    """Heightfield terrain is not eligible for the Pallas fast path."""
    env = task_registry.make_env("anymal_c_rough", num_envs=4)
    assert not supports_pallas(env.sim)


def test_pallas_substep_sharded_parity():
    """shard_map composition over the 8-device mesh (the linsolve's
    treatment, round-4): per-device kernel instances on local env shards
    match the unsharded XLA path, per-env DR rows included."""
    from legged_gym_dev_tpu.parallel.mesh import make_mesh, shard_batch

    B = 32
    mesh = make_mesh(8)
    env = task_registry.make_env("hopper_trajectory", num_envs=B)
    rng = np.random.default_rng(2)
    sim = env.sim.replace(
        base_mass_delta=jnp.asarray(rng.uniform(-1, 1, (B,)), jnp.float32),
        contact=env.sim.contact.replace(
            friction=jnp.asarray(rng.uniform(0.5, 1.2, (B, 1, 1)),
                                 jnp.float32)),
    )
    st = sim.default_state(B)
    st = st.replace(
        base_pos=st.base_pos + jnp.asarray(
            rng.normal(0, 0.05, (B, 3)), jnp.float32),
        q=st.q + jnp.asarray(rng.normal(0, 0.1, st.q.shape), jnp.float32),
        v=jnp.asarray(rng.normal(0, 0.3, st.v.shape), jnp.float32),
    )
    tau = jnp.asarray(rng.normal(0, 3.0, (B, sim.model.nj)), jnp.float32)

    ref = sim.replace(use_pallas_substep=False).substep(st, tau)

    sim_sh = sim.replace(use_pallas_substep=True, shard_mesh=(mesh, "dp"))
    st_sh = shard_batch(st, mesh, batch_size=B)
    tau_sh = shard_batch(tau, mesh, batch_size=B)
    out = jax.jit(sim_sh.substep)(st_sh, tau_sh)
    for name in ("base_pos", "base_quat", "q", "v"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref, name)), np.asarray(getattr(out, name)),
            rtol=2e-5, atol=2e-5, err_msg=name)
    assert len(out.base_pos.sharding.device_set) == 8


def test_auto_default_off_on_cpu():
    """Auto mode (use_pallas_substep=None) must keep the XLA path on CPU
    (interpret-mode pallas would be pathologically slow in the suite)."""
    env = task_registry.make_env("hopper_trajectory", num_envs=8)
    assert env.sim.use_pallas_substep is None
    st = env.sim.default_state(8)
    tau = jnp.zeros((8, env.sim.model.nj))
    ref = env.sim.replace(use_pallas_substep=False).substep(st, tau)
    out = env.sim.substep(st, tau)   # auto -> XLA on CPU: identical program
    np.testing.assert_array_equal(np.asarray(ref.v), np.asarray(out.v))
