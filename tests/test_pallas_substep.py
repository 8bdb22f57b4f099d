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
