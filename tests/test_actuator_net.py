"""ANYdrive LSTM actuator net: TorchScript parity + env integration."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.sim.actuator_net import ActuatorNetLSTM

NET_PATH = "/root/reference/resources/actuator_nets/anydrive_v3_lstm.pt"


@pytest.fixture(scope="module")
def net():
    return ActuatorNetLSTM.from_torchscript(NET_PATH)


def test_matches_torchscript(net):
    import torch

    m = torch.jit.load(NET_PATH, map_location="cpu")
    xt = torch.zeros(6, 1, 2)
    ht = torch.zeros(2, 6, 8)
    ct = torch.zeros(2, 6, 8)
    h = jnp.zeros((2, 6, 8))
    c = jnp.zeros((2, 6, 8))
    rng = np.random.default_rng(0)
    for _ in range(20):
        xi = rng.normal(size=(6, 2)).astype(np.float32) * 0.5
        xt[:, 0, :] = torch.from_numpy(xi)
        with torch.no_grad():
            tt, (ht, ct) = m(xt, (ht, ct))
        tau, h, c = net(jnp.asarray(xi), h, c)
        np.testing.assert_allclose(
            np.asarray(tau), tt.numpy().reshape(-1), atol=1e-4
        )


def test_anymal_env_with_lstm_stable():
    from legged_gym_dev_tpu.envs import task_registry

    env = task_registry.make_env("anymal_c_lstm", num_envs=4, add_noise=False)
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(40):
        state, tr = step(state, jnp.zeros((4, 12)))
    assert np.all(np.isfinite(np.asarray(state.robot.v)))
    assert 0.15 < float(state.robot.base_pos[:, 2].mean()) < 0.7
    # Hidden states advance and reset on done.
    assert bool(jnp.any(state.sea_hidden != 0.0))
    state2 = env._do_reset(state, jnp.ones((4,), bool))
    assert not bool(jnp.any(state2.sea_hidden != 0.0))
