"""Rigid-body engine validation vs MuJoCo + physical-sanity tests.

MuJoCo (the reference's sim2sim target, ref: evaluate_sim2sim.py,
resources/robots/hopper/urdf/hopper.xml) provides golden dynamics for the
hopper URDF: mass matrix, bias forces, forward dynamics, and short
free-space trajectories. Contact is compliant (ours penalty, MuJoCo soft
constraint), so contact behavior is validated by physical invariants rather
than trace equality.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mujoco
from scipy.spatial.transform import Rotation

from legged_gym_dev_tpu.sim.contact import ContactParams
from legged_gym_dev_tpu.sim.dynamics import (
    RobotModel,
    RobotState,
    bias_forces,
    forward_dynamics,
    integrate,
    mass_matrix,
)
from legged_gym_dev_tpu.sim.robot_sim import JointSprings, RobotSim
from legged_gym_dev_tpu.sim.mjcf import build_mjcf
from legged_gym_dev_tpu.sim.urdf import _rpy_to_mat, parse_urdf

HOPPER_URDF = "/root/reference/resources/robots/hopper/urdf/hopper.urdf"


@pytest.fixture(scope="module")
def hopper():
    spec = parse_urdf(HOPPER_URDF)
    return spec, RobotModel.from_spec(spec)


def random_state(rng, nj):
    pos = rng.uniform(-0.5, 0.5, 3) + np.array([0, 0, 2.0])
    quat = Rotation.from_euler("xyz", rng.uniform(-0.5, 0.5, 3)).as_quat()
    qj = rng.uniform(-0.4, 0.4, nj)
    v = rng.uniform(-1, 1, 6 + nj)
    return pos, quat, qj, v


def set_mj_state(d, pos, quat_xyzw, qj, v):
    d.qpos[:3] = pos
    d.qpos[3:7] = [quat_xyzw[3], *quat_xyzw[:3]]
    d.qpos[7:] = qj
    d.qvel[:] = v


def to_state(pos, quat, qj, v):
    f = lambda a: jnp.asarray(a, jnp.float32)[None]
    return RobotState(base_pos=f(pos), base_quat=f(quat), q=f(qj), v=f(v))


def test_analytic_matches_autodiff(hopper):
    """The analytic hot path (kinematics.py) must agree with the independent
    autodiff-of-Lagrangian forms on random states — exercises revolute AND
    prismatic joints (hopper foot) plus contact Jacobians."""
    from legged_gym_dev_tpu.sim import kinematics as kin
    from legged_gym_dev_tpu.sim import dynamics as dyn

    spec, model = hopper
    rng = np.random.default_rng(7)
    states = [random_state(rng, model.nj) for _ in range(4)]
    f = lambda a: jnp.asarray(np.stack(a), jnp.float32)
    state = RobotState(
        base_pos=f([s[0] for s in states]),
        base_quat=f([s[1] for s in states]),
        q=f([s[2] for s in states]),
        v=f([s[3] for s in states]),
    )
    M_a, c_a, pos_a, vel_a, Jc_a = kin.dynamics_terms(model, state)
    M_r = dyn.mass_matrix_autodiff(model, state)
    c_r = dyn.bias_forces_autodiff(model, state)
    pos_r, vel_r, Jc_r = dyn.contact_kinematics_autodiff(model, state)
    np.testing.assert_allclose(np.asarray(M_a), np.asarray(M_r), atol=3e-5)
    np.testing.assert_allclose(np.asarray(c_a), np.asarray(c_r), atol=3e-4)
    np.testing.assert_allclose(np.asarray(pos_a), np.asarray(pos_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(vel_a), np.asarray(vel_r),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(Jc_a), np.asarray(Jc_r), atol=3e-5)


def test_analytic_matches_autodiff_quadruped():
    """Same cross-check on a 12-joint branched tree (anymal URDF)."""
    from legged_gym_dev_tpu.sim import kinematics as kin
    from legged_gym_dev_tpu.sim import dynamics as dyn

    urdf = ("/root/reference/resources/robots/anymal_c/urdf/anymal_c.urdf")
    import os
    if not os.path.exists(urdf):
        pytest.skip("anymal URDF not present")
    model = RobotModel.from_spec(parse_urdf(urdf))
    rng = np.random.default_rng(8)
    pos, quat, qj, v = random_state(rng, model.nj)
    state = to_state(pos, quat, qj, v)
    M_a = kin.mass_matrix(model, state)
    c_a = kin.bias_forces(model, state)
    M_r = dyn.mass_matrix_autodiff(model, state)
    c_r = dyn.bias_forces_autodiff(model, state)
    scale = float(np.abs(np.asarray(M_r)).max())
    np.testing.assert_allclose(np.asarray(M_a), np.asarray(M_r),
                               atol=3e-5 * max(1.0, scale))
    np.testing.assert_allclose(np.asarray(c_a), np.asarray(c_r), atol=2e-3)


@pytest.mark.parametrize("urdf", [
    "/root/reference/resources/robots/anymal_c/urdf/anymal_c.urdf",
    "/root/reference/resources/robots/a1/urdf/a1.urdf",
])
def test_dynamics_matches_mujoco_quadruped(urdf):
    """MuJoCo golden parity on branched 12-DoF trees: the MJCF export
    composes fixed-link inertials and nests the true topology (a flat
    raw-link export drops 46 of ANYmal's 52 kg)."""
    import os

    if not os.path.exists(urdf):
        pytest.skip("URDF not present")
    spec = parse_urdf(urdf)
    model = RobotModel.from_spec(spec)
    m = mujoco.MjModel.from_xml_string(build_mjcf(spec))
    assert abs(float(m.body_mass.sum())
               - float(np.asarray(model.mass).sum())) < 1e-4
    d = mujoco.MjData(m)
    rng = np.random.default_rng(0)
    for trial in range(3):
        pos, quat, qj, v = random_state(rng, model.nj)
        tau = rng.uniform(-10, 10, model.nj)
        set_mj_state(d, pos, quat, qj, v)
        d.qfrc_applied[:] = 0
        d.qfrc_applied[6:] = tau
        mujoco.mj_forward(m, d)
        M_mj = np.zeros((model.nv, model.nv))
        mujoco.mj_fullM(m, d, M_mj)
        state = to_state(pos, quat, qj, v)
        M_us = np.asarray(mass_matrix(model, state))[0]
        c_us = np.asarray(bias_forces(model, state))[0]
        qdd_us = np.asarray(
            forward_dynamics(model, state,
                             jnp.asarray(tau, jnp.float32)[None],
                             jnp.zeros((1, model.nv))))[0]
        np.testing.assert_allclose(M_us, M_mj, atol=2e-5)
        np.testing.assert_allclose(c_us, d.qfrc_bias, atol=5e-4)
        scale = max(1.0, np.abs(d.qacc).max())
        assert np.abs(qdd_us - d.qacc).max() / scale < 2e-5


def test_dynamics_matches_mujoco(hopper):
    spec, model = hopper
    m = mujoco.MjModel.from_xml_string(build_mjcf(spec))
    d = mujoco.MjData(m)
    rng = np.random.default_rng(0)
    for trial in range(3):
        pos, quat, qj, v = random_state(rng, model.nj)
        tau = rng.uniform(-1, 1, model.nj)
        set_mj_state(d, pos, quat, qj, v)
        d.qfrc_applied[:] = 0
        d.qfrc_applied[6:] = tau
        mujoco.mj_forward(m, d)
        M_mj = np.zeros((model.nv, model.nv))
        mujoco.mj_fullM(m, d, M_mj)

        state = to_state(pos, quat, qj, v)
        M_us = np.asarray(mass_matrix(model, state))[0]
        c_us = np.asarray(bias_forces(model, state))[0]
        qdd_us = np.asarray(
            forward_dynamics(model, state, jnp.asarray(tau, jnp.float32)[None],
                             jnp.zeros((1, model.nv)))
        )[0]
        np.testing.assert_allclose(M_us, M_mj, atol=2e-6)
        np.testing.assert_allclose(c_us, d.qfrc_bias, atol=2e-5)
        scale = max(1.0, np.abs(d.qacc).max())
        assert np.abs(qdd_us - d.qacc).max() / scale < 2e-5


def test_free_space_trajectory_matches_mujoco(hopper):
    spec, model = hopper
    m = mujoco.MjModel.from_xml_string(build_mjcf(spec))
    d = mujoco.MjData(m)
    rng = np.random.default_rng(1)
    pos, quat, qj, v = random_state(rng, model.nj)
    v *= 0.3
    set_mj_state(d, pos, quat, qj, v)
    state = to_state(pos, quat, qj, v)
    dt = 0.005
    for _ in range(100):
        mujoco.mj_step(m, d)

    @jax.jit
    def roll(state):
        def body(s, _):
            qdd = forward_dynamics(model, s, jnp.zeros((1, model.nj)),
                                   jnp.zeros((1, model.nv)))
            return integrate(model, s, qdd, dt), None
        return jax.lax.scan(body, state, None, length=100)[0]

    state = roll(state)
    np.testing.assert_allclose(
        np.asarray(state.base_pos)[0], d.qpos[:3], atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(state.q)[0], d.qpos[7:], atol=2e-3)
    q_mj = np.array([*d.qpos[4:7], d.qpos[3]])  # wxyz -> xyzw
    q_us = np.asarray(state.base_quat)[0]
    assert min(np.abs(q_us - q_mj).max(), np.abs(q_us + q_mj).max()) < 2e-3


def test_momentum_conservation_no_gravity(hopper):
    spec, model = hopper
    model = model.replace(gravity=jnp.zeros(3))
    rng = np.random.default_rng(2)
    pos, quat, qj, v = random_state(rng, model.nj)
    state = to_state(pos, quat, qj, v)

    def com_momentum(state):
        from legged_gym_dev_tpu.sim.dynamics import _body_jacobians
        from legged_gym_dev_tpu.core.maths import quat_to_rotmat
        c, R, Jp, Jr = _body_jacobians(
            model, state.base_pos[0], quat_to_rotmat(state.base_quat[0]),
            state.q[0],
        )
        vels = jnp.einsum("bik,k->bi", Jp, state.v[0])
        return np.asarray(jnp.sum(model.mass[:, None] * vels, axis=0))

    p0 = com_momentum(state)
    for _ in range(50):
        qdd = forward_dynamics(model, state, jnp.zeros((1, model.nj)),
                               jnp.zeros((1, model.nv)))
        state = integrate(model, state, qdd, 0.002)
    p1 = com_momentum(state)
    np.testing.assert_allclose(p1, p0, atol=2e-3)


def test_hopper_drop_settles_on_foot(hopper):
    """Drop test: spring foot contact, no explosion, settles above ground
    (the reference's foot spring k~7000, hopper_config.py:76)."""
    spec, model = hopper
    springs = JointSprings(
        stiffness=jnp.asarray([7000.0, 0, 0, 0]),
        damping=jnp.asarray([20.0, 0.2, 0.2, 0.2]),
        setpoint=jnp.asarray([0.05, 0, 0, 0]),
    )
    sim = RobotSim.create(
        model, springs=springs,
        contact=ContactParams.create(stiffness=8000.0, damping=60.0),
        dt=0.005, decimation=4,
    )
    B = 8
    state = sim.default_state(B, base_pos=(0.0, 0.0, 0.6))

    @jax.jit
    def run(state):
        def body(s, _):
            s = sim.step(s, lambda st: jnp.zeros((B, model.nj)))
            return s, s.base_pos[:, 2]
        return jax.lax.scan(body, state, None, length=250)

    state, heights = run(state)
    h = np.asarray(heights)
    assert np.all(np.isfinite(np.asarray(state.v)))
    # The spring catches the fall: during the first bounce (first second)
    # the base never approaches the ground (no tunnel-through).
    assert h[:50].min() > 0.2
    # No energy injection: never bounces above the drop height.
    assert h.max() < 0.65
    # Settled somewhere physical. NOTE: uncontrolled upright standing is an
    # UNSTABLE equilibrium (inverted pendulum); float rounding asymmetry
    # decides whether it stays up (~0.31) or tips over and lies down
    # (~0.075), so both are correct physics — only "resting on the terrain,
    # not through it" is invariant.
    assert 0.04 < h[-1].mean() < 0.55
    # Settled: final velocities small.
    assert np.abs(np.asarray(state.v)[:, 2]).max() < 0.5


def test_batched_envs_independent(hopper):
    spec, model = hopper
    sim = RobotSim.create(model)
    state = sim.default_state(4, base_pos=(0.0, 0.0, 1.0))
    state = state.replace(
        base_pos=state.base_pos.at[2:, 2].set(2.0)
    )
    for _ in range(10):
        state = sim.substep(state, jnp.zeros((4, model.nj)))
    z = np.asarray(state.base_pos[:, 2])
    np.testing.assert_allclose(z[0], z[1], atol=1e-6)
    assert z[2] - z[0] > 0.5
