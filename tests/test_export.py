"""Policy export round-trips: StableHLO and TorchScript parity."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.rl import ActorCritic
from legged_gym_dev_tpu.utils.export import (
    export_policy_stablehlo,
    export_policy_torchscript,
    load_policy_stablehlo,
)


def _make_policy(obs_dim=12, num_actions=4):
    model = ActorCritic(num_actions=num_actions,
                        actor_hidden_dims=(32, 16),
                        critic_hidden_dims=(32, 16))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)))

    def policy(obs):
        mean, _, _ = model.apply(params, obs)
        return mean

    return policy, params, obs_dim


def test_stablehlo_roundtrip(tmp_path):
    policy, _, obs_dim = _make_policy()
    path = export_policy_stablehlo(policy, obs_dim,
                                   str(tmp_path / "policy.shlo"), batch=3)
    assert os.path.exists(path)
    loaded = load_policy_stablehlo(path)
    obs = jax.random.normal(jax.random.PRNGKey(1), (3, obs_dim))
    np.testing.assert_allclose(np.asarray(loaded(obs)),
                               np.asarray(policy(obs)), atol=1e-6)


def test_torchscript_parity(tmp_path):
    torch = pytest.importorskip("torch")
    policy, params, obs_dim = _make_policy()
    path = export_policy_torchscript(params, str(tmp_path / "policy.pt"))
    loaded = torch.jit.load(path)
    obs = np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (5, obs_dim)), np.float32
    )
    with torch.no_grad():
        out_t = loaded(torch.from_numpy(obs)).numpy()
    out_j = np.asarray(policy(jnp.asarray(obs)))
    np.testing.assert_allclose(out_t, out_j, atol=1e-5)


def test_lstm_torchscript_stateful_parity(tmp_path):
    torch = pytest.importorskip("torch")
    from legged_gym_dev_tpu.rl.networks import ActorCriticRecurrent
    from legged_gym_dev_tpu.utils.export import export_policy_lstm_torchscript

    obs_dim, num_actions = 7, 3
    model = ActorCriticRecurrent(num_actions=num_actions, rnn_hidden_size=16,
                                 actor_hidden_dims=(16,),
                                 critic_hidden_dims=(16,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)),
                        model.initial_carry(1))
    path = export_policy_lstm_torchscript(params,
                                          str(tmp_path / "policy_lstm.pt"))
    loaded = torch.jit.load(path)

    seq = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (6, 1, obs_dim)), np.float32
    )
    # JAX reference trace
    carry = model.initial_carry(1)
    means_j = []
    for t in range(6):
        mean, _, _, carry = model.apply(params, jnp.asarray(seq[t]), carry)
        means_j.append(np.asarray(mean))
    # torch stateful trace
    means_t = []
    with torch.no_grad():
        for t in range(6):
            means_t.append(loaded(torch.from_numpy(seq[t])).numpy())
    np.testing.assert_allclose(np.stack(means_t), np.stack(means_j),
                               atol=1e-5)
    # reset_memory parity: trace restarts
    loaded.reset_memory()
    with torch.no_grad():
        out_reset = loaded(torch.from_numpy(seq[0])).numpy()
    np.testing.assert_allclose(out_reset, means_t[0], atol=1e-6)


def test_onnx_export_gated(tmp_path):
    """ONNX export works when `onnx` is installed, returns None otherwise."""
    from legged_gym_dev_tpu.utils.export import export_policy_onnx

    policy, params, obs_dim = _make_policy()
    path = export_policy_onnx(params, obs_dim, str(tmp_path / "policy.onnx"))
    try:
        import onnx  # noqa: F401
    except ImportError:
        assert path is None
        return
    assert os.path.exists(path)
    ort = pytest.importorskip("onnxruntime")
    sess = ort.InferenceSession(path)
    obs = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (5, obs_dim)), np.float32
    )
    (out,) = sess.run(None, {"obs": obs})
    np.testing.assert_allclose(out, np.asarray(policy(jnp.asarray(obs))),
                               atol=1e-5)
