"""Fresh-compile-time measurement for the quadruped (nj=12) programs.

VERDICT r1 weak #7: 10-30 min fresh compiles dominate any real experiment
loop. This script times trace (.lower()) and XLA compile (.compile())
separately via the AOT API, with the persistent compile cache pointed at a
throwaway dir so every run is a true cold compile.

Knobs (env vars):
  TARGET  = substep | envstep | ppo   (default substep)
  BARRIER = auto | all | fk | off     (sim fusion_barriers; default auto)
  B       = batch size                (default 4096)
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

    # rbg PRNG yes; persistent cache -> throwaway dir (cold compile).
    setup_tpu_runtime(compilation_cache=None)
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      tempfile.mkdtemp(prefix="jaxcache_cold_"))

    import jax.numpy as jnp

    from legged_gym_dev_tpu.envs import task_registry

    B = int(os.environ.get("B", "4096"))
    target = os.environ.get("TARGET", "substep")
    barrier = os.environ.get("BARRIER", "auto")

    env = task_registry.make_env("anymal_c_trajectory", num_envs=B)
    sim = env.sim
    if barrier != "auto":
        bmap = {"all": "all", "fk": True, "off": False}
        import functools

        from legged_gym_dev_tpu.sim import kinematics as K

        orig = K.substep_core
        K.substep_core = functools.partial(orig,
                                           fusion_barriers=bmap[barrier])

    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)

    if target == "substep":
        fn = jax.jit(sim.substep)
        args = (state.robot, jnp.zeros((B, 12)))
    elif target == "envstep":
        fn = jax.jit(env.step)
        args = (state, jnp.zeros((B, env.num_actions)))
    else:  # ppo learn iteration
        from legged_gym_dev_tpu.rl import ActorCritic, PPOConfig
        from legged_gym_dev_tpu.rl.ppo import (
            init_train_state,
            make_learn_iteration,
        )

        ac = ActorCritic(num_actions=env.num_actions,
                         actor_hidden_dims=(512, 256, 128),
                         critic_hidden_dims=(512, 256, 128))
        cfg = PPOConfig()
        ts = init_train_state(ac, env.num_obs, cfg, key)
        fn = jax.jit(make_learn_iteration(env, ac, cfg))
        args = (ts, state)

    t0 = time.perf_counter()
    lowered = fn.lower(*args)
    t_trace = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"target={target} barrier={barrier} B={B}: "
          f"trace={t_trace:.1f}s xla_compile={t_compile:.1f}s", flush=True)

    # one execution to confirm it runs
    out = compiled(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    print("runs ok", flush=True)


if __name__ == "__main__":
    main()
