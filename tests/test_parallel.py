"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

Validates that the framework's dp-sharded paths (batched solver, PPO train
iteration, env stepping) compile and execute correctly over a
`jax.sharding.Mesh`, and that sharded results match single-device results —
the correctness half of the BASELINE multi-host scaling requirement (timing
efficiency is measured on real hardware by bench_scaling.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from legged_gym_dev_tpu.parallel.mesh import make_mesh, replicate, shard_batch

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV
    return make_mesh(N_DEV)


def test_sharded_tube_solve_matches_unsharded(mesh):
    from legged_gym_dev_tpu.core import make_rom
    from legged_gym_dev_tpu.solver import ALConfig, PROBLEM_DICT, TrajOptParams
    from legged_gym_dev_tpu.solver.fast_tube import solve_tube_fast_batched

    prob = PROBLEM_DICT["gap"]
    N, H_REV, B = 10, 5, 16
    pm = make_rom("SingleInt2D", prob["dt"], [-10, -10], [10, 10],
                  [-0.2, -0.2], [0.2, 0.2])
    p = TrajOptParams.create(
        pm, N, H_REV, 10 * np.eye(2), 10 * np.eye(2), prob["start"],
        prob["goal"], prob["obs"]["c"], prob["obs"]["r"], Qw=0.0, w_max=1.0,
    )
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
    pb = pb.replace(z0=pb.z0 + jnp.linspace(-0.1, 0.1, B)[:, None])
    cfg = ALConfig(outer_iters=5, inner_iters=5)

    solve = jax.jit(lambda pb: solve_tube_fast_batched(
        pb, N, H_REV, tube_kind="l1", scaling=0.5, cfg=cfg,
        warm_start="interpolate", tube_ws=0.0,
    ))
    out_single = solve(pb)

    pb_sharded = shard_batch(pb, mesh)
    out_sharded = solve(pb_sharded)
    # Output carries the dp sharding and values match exactly.
    np.testing.assert_allclose(
        np.asarray(out_sharded.z), np.asarray(out_single.z), atol=1e-5
    )
    assert len(out_sharded.z.sharding.device_set) == N_DEV


def test_sharded_ppo_iteration(mesh):
    from legged_gym_dev_tpu.envs import task_registry
    from legged_gym_dev_tpu.rl import ActorCritic, PPOConfig
    from legged_gym_dev_tpu.rl.ppo import init_train_state, make_learn_iteration

    env = task_registry.make_env("rom_tracking", num_envs=64)
    model = ActorCritic(num_actions=2, actor_hidden_dims=(32,),
                        critic_hidden_dims=(32,))
    cfg = PPOConfig(num_steps=8, num_mini_batches=2, num_learning_epochs=2)
    ts = init_train_state(model, env.num_obs, cfg, jax.random.PRNGKey(0))
    env_state, _ = env.reset(jax.random.PRNGKey(1))

    ts = replicate(ts, mesh)
    env_state = shard_batch(env_state, mesh)

    learn = make_learn_iteration(env, model, cfg)
    ts2, env_state2, metrics = learn(ts, env_state)
    assert np.isfinite(float(metrics["mean_reward"]))
    assert np.isfinite(float(metrics["loss"]))
    # Parameters stay replicated (gradient all-reduce happened inside jit).
    leaf = jax.tree.leaves(ts2.params)[0]
    assert len(leaf.sharding.device_set) == N_DEV


def test_sharded_env_rollout(mesh):
    from legged_gym_dev_tpu.envs import task_registry

    env = task_registry.make_env("rom_tracking", num_envs=64)
    state, obs = env.reset(jax.random.PRNGKey(0))
    state = shard_batch(state, mesh)

    @jax.jit
    def roll(state):
        def body(s, _):
            s, tr = env.step(s, jnp.zeros((64, 2)))
            return s, tr.reward
        return jax.lax.scan(body, state, None, length=10)

    state2, rews = roll(state)
    assert np.all(np.isfinite(np.asarray(rews)))


def test_ppo_grad_allreduce_in_hlo(mesh):
    """The compiled dp-sharded PPO step must contain a real XLA all-reduce
    (the gradient reduction GSPMD inserts when sharded-batch losses meet
    replicated params) — numerical parity alone can't distinguish 'sharded
    as designed' from 'silently resharded to one device'."""
    from legged_gym_dev_tpu.envs import task_registry
    from legged_gym_dev_tpu.rl import ActorCritic, PPOConfig
    from legged_gym_dev_tpu.rl.ppo import init_train_state, make_learn_iteration

    env = task_registry.make_env("rom_tracking", num_envs=64)
    model = ActorCritic(num_actions=2, actor_hidden_dims=(32,),
                        critic_hidden_dims=(32,))
    cfg = PPOConfig(num_steps=4, num_mini_batches=2, num_learning_epochs=1)
    ts = init_train_state(model, env.num_obs, cfg, jax.random.PRNGKey(0))
    env_state, _ = env.reset(jax.random.PRNGKey(1))
    ts = replicate(ts, mesh)
    env_state = shard_batch(env_state, mesh)

    learn = make_learn_iteration(env, model, cfg)
    hlo = jax.jit(learn).lower(ts, env_state).compile().as_text()
    assert "all-reduce" in hlo or "all_reduce" in hlo
    # And the input shardings really are what we think.
    leaf = jax.tree_util.tree_leaves(env_state)[0]
    assert len(leaf.sharding.device_set) == N_DEV
    p_leaf = jax.tree_util.tree_leaves(ts.params)[0]
    assert p_leaf.sharding.is_fully_replicated


def test_sharded_closed_loop_mpc(mesh):
    """The receding-horizon MPC scan runs dp-sharded: per-scenario re-solves
    are independent, so the batch shards over the mesh with no collectives
    and the executed trace keeps the dp sharding."""
    from legged_gym_dev_tpu.core import DoubleInt2D, make_rom
    from legged_gym_dev_tpu.solver import ALConfig, PROBLEM_DICT, TrajOptParams
    from legged_gym_dev_tpu.solver.fast_tube import closed_loop_tube_mpc_fast

    prob = PROBLEM_DICT["gap"]
    N, H_REV, B = 8, 4, 16
    pm = make_rom("SingleInt2D", prob["dt"], [-10, -10], [10, 10],
                  [-1, -1], [1, 1])
    p = TrajOptParams.create(
        pm, N, H_REV, 10 * np.eye(2), 10 * np.eye(2), prob["start"],
        prob["goal"], prob["obs"]["c"], prob["obs"]["r"], Qw=0.0, w_max=1.0,
    )
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
    pb = pb.replace(z0=pb.z0 + jnp.linspace(-0.1, 0.1, B)[:, None])
    robot = DoubleInt2D.create(
        prob["dt"], [-np.inf, -np.inf, -0.3, -0.3],
        [np.inf, np.inf, 0.3, 0.3], [-0.5, -0.5], [0.5, 0.5],
    )

    run = jax.jit(jax.vmap(lambda pp: closed_loop_tube_mpc_fast(
        pp, robot, tube_kind="l1", scaling=0.5, H=3, N=N, H_rev=H_REV,
        cfg_first=ALConfig(outer_iters=3, inner_iters=3, ls_iters=4),
        cfg_loop=ALConfig(outer_iters=1, inner_iters=2, ls_iters=4),
        warm_start="interpolate", tube_ws=0.0,
    )))
    out_single = run(pb)
    out_sharded = run(shard_batch(pb, mesh))
    np.testing.assert_allclose(np.asarray(out_sharded[0]),
                               np.asarray(out_single[0]), atol=1e-5)
    assert len(out_sharded[0].sharding.device_set) == N_DEV


def test_sharded_collect_step(mesh):
    """The tube-data collection rollout (ROM sim + PD tracker) shards over
    envs and keeps the dp sharding through the scan."""
    from legged_gym_dev_tpu.controllers import DoubleSingleTracking
    from legged_gym_dev_tpu.envs.presets import make_rom_tracking_env

    env = make_rom_tracking_env(num_envs=2 * N_DEV)
    sim = env.sim
    policy = DoubleSingleTracking.create(4.0, 4.0, sim.model.clip_v_z)
    state = shard_batch(sim.reset(jax.random.PRNGKey(0)), mesh,
                        batch_size=sim.num_envs)

    @jax.jit
    def collect_step(s):
        def env_step(s2, _):
            obs = sim.get_observations(s2)
            return sim.step(s2, policy(obs)), None

        s, _ = jax.lax.scan(env_step, s, None, length=4)
        return s, sim.rom.proj_z(s.root_states)

    state2, proj = collect_step(state)
    assert np.all(np.isfinite(np.asarray(proj)))
    assert len(proj.sharding.device_set) == N_DEV


def test_runner_with_mesh(mesh, tmp_path):
    """OnPolicyRunner trains dp-sharded over the mesh (the reference's dead
    --horovod flag done properly): env state sharded, params replicated,
    metrics finite, and the trained params stay replicated."""
    from legged_gym_dev_tpu.envs import task_registry
    from legged_gym_dev_tpu.rl import ActorCritic, PPOConfig

    env = task_registry.make_env("rom_tracking", num_envs=2 * N_DEV,
                                 episode_length_s=1.0)
    model = ActorCritic(num_actions=2, actor_hidden_dims=(16,),
                        critic_hidden_dims=(16,))
    from legged_gym_dev_tpu.rl.runner import OnPolicyRunner

    runner = OnPolicyRunner(
        env, model=model,
        cfg=PPOConfig(num_steps=4, num_mini_batches=2,
                      num_learning_epochs=1),
        log_dir=str(tmp_path / "run"), mesh=mesh,
    )
    hist = runner.learn(2, save_interval=100)
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["loss"])
    # env state sharded over dp, params replicated.
    leaf = jax.tree_util.tree_leaves(runner.env_state)[0]
    assert len(leaf.sharding.device_set) == N_DEV
    p_leaf = jax.tree_util.tree_leaves(runner.train_state.params)[0]
    assert p_leaf.sharding.is_fully_replicated


def test_host_mesh_2axis_solve():
    """(dcn, ici) 2-axis host-topology mesh (SURVEY §2.2 DCN row; BASELINE
    >=0.85x-linear multi-host): scenarios shard over the PRODUCT of both
    axes, each solve stays chip-local — the compiled solve program contains
    NO cross-device collectives (nothing rides DCN during solves) — while a
    convergence-stats reduction does produce a real all-reduce."""
    from legged_gym_dev_tpu.core import make_rom
    from legged_gym_dev_tpu.parallel.mesh import make_host_mesh
    from legged_gym_dev_tpu.solver import ALConfig, PROBLEM_DICT, TrajOptParams
    from legged_gym_dev_tpu.solver.fast_tube import solve_tube_fast_batched

    mesh2 = make_host_mesh(2, N_DEV // 2)
    assert mesh2.axis_names == ("dcn", "ici")
    assert mesh2.devices.shape == (2, N_DEV // 2)

    prob = PROBLEM_DICT["gap"]
    N, H_REV, B = 10, 5, 16
    pm = make_rom("SingleInt2D", prob["dt"], [-10, -10], [10, 10],
                  [-0.2, -0.2], [0.2, 0.2])
    p = TrajOptParams.create(
        pm, N, H_REV, 10 * np.eye(2), 10 * np.eye(2), prob["start"],
        prob["goal"], prob["obs"]["c"], prob["obs"]["r"], Qw=0.0, w_max=1.0,
    )
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
    pb = pb.replace(z0=pb.z0 + jnp.linspace(-0.1, 0.1, B)[:, None])
    cfg = ALConfig(outer_iters=5, inner_iters=5)

    solve = jax.jit(lambda pb: solve_tube_fast_batched(
        pb, N, H_REV, tube_kind="l1", scaling=0.5, cfg=cfg,
        warm_start="interpolate", tube_ws=0.0,
    ))
    out_single = solve(pb)

    pb2 = shard_batch(pb, mesh2, axis=("dcn", "ici"), batch_size=B)
    out2 = solve(pb2)
    np.testing.assert_allclose(np.asarray(out2.z), np.asarray(out_single.z),
                               atol=1e-5)
    assert len(out2.z.sharding.device_set) == N_DEV

    # Solve program: chip-local — no collectives may cross the mesh
    # (neither ici nor dcn).
    hlo = solve.lower(pb2).compile().as_text()
    for coll in ("all-reduce", "all-gather", "collective-permute",
                 "reduce-scatter", "all-to-all"):
        assert coll not in hlo, f"solve program unexpectedly contains {coll}"

    # Convergence stats DO reduce across the mesh (the only traffic that
    # crosses DCN between re-solves).
    stats = jax.jit(lambda pb: jnp.mean(
        (solve(pb).sol.viol < 1e-3).astype(jnp.float32)))
    frac = stats(pb2)
    assert 0.0 <= float(frac) <= 1.0
    hlo_stats = stats.lower(pb2).compile().as_text()
    assert ("all-reduce" in hlo_stats) or ("all_reduce" in hlo_stats)


def test_shard_map_pallas_linsolve(mesh):
    """The Pallas kernel factor under a multi-device mesh: wrap the vmapped
    solve in shard_map so each device runs its own kernel instance on its
    LOCAL scenario shard (the documented deployment for linsolve='pallas'
    on real pods; interpret-mode kernel on the CPU mesh)."""
    from functools import partial

    from jax.experimental.shard_map import shard_map

    from legged_gym_dev_tpu.core import make_rom
    from legged_gym_dev_tpu.solver import ALConfig, PROBLEM_DICT, TrajOptParams
    from legged_gym_dev_tpu.solver.fast_tube import solve_tube_fast_batched

    prob = PROBLEM_DICT["gap"]
    N, H_REV, B = 10, 5, 16
    pm = make_rom("SingleInt2D", prob["dt"], [-10, -10], [10, 10],
                  [-0.2, -0.2], [0.2, 0.2])
    p = TrajOptParams.create(
        pm, N, H_REV, 10 * np.eye(2), 10 * np.eye(2), prob["start"],
        prob["goal"], prob["obs"]["c"], prob["obs"]["r"], Qw=0.0, w_max=1.0,
    )
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
    pb = pb.replace(z0=pb.z0 + jnp.linspace(-0.1, 0.1, B)[:, None])
    cfg = ALConfig(outer_iters=5, inner_iters=5, linsolve="pallas")

    def local_solve(pb_local):
        out = solve_tube_fast_batched(
            pb_local, N, H_REV, tube_kind="l1", scaling=0.5, cfg=cfg,
            warm_start="interpolate", tube_ws=0.0)
        return out.z, out.sol.viol

    # Every leaf of the scenario pytree shards on its leading (batch) axis.
    spec = jax.tree.map(lambda _: P("dp"), pb)
    sharded = jax.jit(shard_map(
        local_solve, mesh=mesh, in_specs=(spec,),
        out_specs=(P("dp"), P("dp")), check_rep=False))
    pb_sharded = shard_batch(pb, mesh, batch_size=B)
    z_s, viol_s = sharded(pb_sharded)

    cfg_ref = ALConfig(outer_iters=5, inner_iters=5, linsolve="thomas")
    out_ref = jax.jit(lambda pb: solve_tube_fast_batched(
        pb, N, H_REV, tube_kind="l1", scaling=0.5, cfg=cfg_ref,
        warm_start="interpolate", tube_ws=0.0))(pb)
    np.testing.assert_allclose(np.asarray(z_s), np.asarray(out_ref.z),
                               atol=2e-3)
    assert len(z_s.sharding.device_set) == N_DEV


# ---------------------------------------------------------------------------
# (dcn, ici) host-mesh training steps (round-4: the collectives that
# actually cross the host boundary — SURVEY §2.2 DCN row)
# ---------------------------------------------------------------------------

def test_parse_replica_groups_forms():
    from legged_gym_dev_tpu.parallel.mesh import parse_replica_groups

    assert parse_replica_groups("{}", 4) == [[0, 1, 2, 3]]
    assert parse_replica_groups("{{0,1},{2,3}}", 4) == [[0, 1], [2, 3]]
    # iota form: reshape(arange(8), (2,4)) -> rows are groups.
    assert parse_replica_groups("[2,4]<=[8]", 8) == [[0, 1, 2, 3],
                                                     [4, 5, 6, 7]]
    # transposed iota: reshape(arange(8),(4,2)).T -> [[0,2,4,6],[1,3,5,7]].
    assert parse_replica_groups("[2,4]<=[4,2]T(1,0)", 8) == [
        [0, 2, 4, 6], [1, 3, 5, 7]]


def test_hlo_cross_host_detector():
    from legged_gym_dev_tpu.parallel.mesh import hlo_collective_crosses_hosts

    intra = 'x = f32[4] all-reduce(y), replica_groups={{0,1,2,3},{4,5,6,7}}'
    cross = 'x = f32[4] all-reduce(y), replica_groups={{0,4},{1,5}}'
    full = 'x = f32[4] all-reduce(y), replica_groups={}'
    assert not hlo_collective_crosses_hosts(intra, 8, 4)
    assert hlo_collective_crosses_hosts(cross, 8, 4)
    assert hlo_collective_crosses_hosts(full, 8, 4)


def test_host_mesh_ppo_learn_crosses_dcn(mesh):
    """PPO learn iteration on the (2, 4) host mesh: gradient all-reduce
    must span the dcn (host) axis, and the loss must match the 1-axis
    mesh run (same data layout, different sharding)."""
    from legged_gym_dev_tpu.envs import task_registry
    from legged_gym_dev_tpu.parallel.mesh import (
        hlo_collective_crosses_hosts,
        make_host_mesh,
    )
    from legged_gym_dev_tpu.rl import ActorCritic, PPOConfig
    from legged_gym_dev_tpu.rl.ppo import init_train_state, make_learn_iteration

    env = task_registry.make_env("rom_tracking", num_envs=4 * N_DEV)
    ac = ActorCritic(num_actions=2, actor_hidden_dims=(16,),
                     critic_hidden_dims=(16,))
    cfg = PPOConfig(num_steps=4, num_mini_batches=2, num_learning_epochs=1)
    ts = init_train_state(ac, env.num_obs, cfg, jax.random.PRNGKey(2))
    env_state, _ = env.reset(jax.random.PRNGKey(3))
    learn = make_learn_iteration(env, ac, cfg)

    mesh2 = make_host_mesh(2, N_DEV // 2)
    ts_h = replicate(ts, mesh2)
    st_h = shard_batch(env_state, mesh2, axis=("dcn", "ici"),
                       batch_size=env.num_envs)
    ts2, st2, metrics = learn(ts_h, st_h)
    assert np.isfinite(float(metrics["loss"]))
    hlo = learn.lower(ts_h, st_h).compile().as_text()
    assert hlo_collective_crosses_hosts(hlo, N_DEV, N_DEV // 2)

    # Same step on the 1-axis dp mesh gives the same loss (sharding is an
    # execution detail, not a numerics change).
    mesh1 = make_mesh(N_DEV)
    ts_1 = replicate(ts, mesh1)
    st_1 = shard_batch(env_state, mesh1, batch_size=env.num_envs)
    _, _, metrics1 = learn(ts_1, st_1)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics1["loss"]), rtol=1e-4)


def test_host_mesh_tube_train_crosses_dcn(mesh):
    from legged_gym_dev_tpu.parallel.mesh import (
        hlo_collective_crosses_hosts,
        make_host_mesh,
        tree_bytes,
    )
    from legged_gym_dev_tpu.tube.models import MLP

    mesh2 = make_host_mesh(2, N_DEV // 2)
    key = jax.random.PRNGKey(0)
    mlp = MLP.create(key, 16, 4, num_units=32, num_layers=2)
    assert tree_bytes(mlp) > 0
    x = jax.random.normal(key, (64, 16))
    y = jax.random.normal(key, (64, 4))

    @jax.jit
    def train_step(model, xb, yb):
        def loss_fn(m):
            return jnp.mean((m(xb) - yb) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(model)
        return jax.tree.map(lambda p_, g: p_ - 1e-3 * g, model, grads), loss

    mlp_h = replicate(mlp, mesh2)
    dp2 = NamedSharding(mesh2, P(("dcn", "ici")))
    xh, yh = jax.device_put(x, dp2), jax.device_put(y, dp2)
    _, loss = train_step(mlp_h, xh, yh)
    assert np.isfinite(float(loss))
    hlo = train_step.lower(mlp_h, xh, yh).compile().as_text()
    assert hlo_collective_crosses_hosts(hlo, N_DEV, N_DEV // 2)
