"""Functional RL environment protocol + reward-term registry.

TPU-native re-design of the reference env layer (ref:
legged_gym/envs/base/base_task.py, legged_robot.py): instead of a mutable
class holding GPU buffers, an env is a static config object (flax struct)
whose methods transform an explicit ``EnvState`` pytree:

    state, obs             = env.reset(key)
    state, transition      = env.step(state, actions)

``Transition`` carries the rsl_rl VecEnv quintuple (obs, privileged obs,
reward, done, extras) (ref: legged_robot.py:80-104, base_task.py:101-119),
with ``extras`` holding per-term episode reward sums normalized by episode
seconds and time-out flags (ref: legged_robot.py:174-187).

Reward terms are an explicit name->function table per env (replacing the
reference's ``_reward_*`` reflection scan, ref: legged_robot.py:605-630;
SURVEY.md §7 hard part 5): each term maps (env, state) -> (B,) rewards and is
scaled by the config's ``reward_scales`` dict; zero-scaled terms are dropped
at construction exactly like the reference.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp


class Transition(NamedTuple):
    obs: jax.Array            # (B, num_obs)
    privileged_obs: Any       # (B, num_privileged_obs) or None
    reward: jax.Array         # (B,)
    done: jax.Array           # (B,) bool — env was reset after this step
    info: Dict[str, Any]      # {'episode': {...}, 'time_outs': (B,)}


def scaled_reward_terms(term_table: Dict[str, Callable],
                        reward_scales: Dict[str, float], dt: float):
    """Resolve the active (name, fn, scale) list.

    Scales are multiplied by the policy dt exactly as the reference does
    (ref: legged_robot.py:612-617); zero-scale terms are removed.
    'termination' is applied unscaled-by-dt after clipping (ref :266-270) —
    callers handle it separately.
    """
    active = []
    for name, scale in reward_scales.items():
        if scale == 0 or name == "termination":
            continue
        if name not in term_table:
            raise ValueError(
                f"Reward term '{name}' not in table {sorted(term_table)}"
            )
        active.append((name, term_table[name], float(scale) * dt))
    return active


def compute_total_reward(active_terms, env, state, only_positive=False,
                         termination_fn=None, termination_scale=0.0):
    """Sum scaled terms; optionally clip negative totals, then add the
    termination reward post-clip (ref: legged_robot.py:189-207)."""
    total = 0.0
    episode = {}
    for name, fn, scale in active_terms:
        r = fn(env, state) * scale
        total = total + r
        episode[name] = r
    if only_positive:
        total = jnp.clip(total, 0.0)
    if termination_fn is not None and termination_scale != 0.0:
        r = termination_fn(env, state) * termination_scale
        total = total + r
        episode["termination"] = r
    return total, episode


def guard_finite_state(robot, safe_state, explosion_vel: float = 50.0):
    """Detect and neutralize envs whose physics state went non-finite OR
    exploded to non-physical velocities.

    With the explicit integrator a contact blow-up can overflow to inf
    WITHIN one decimated control step — before env-level termination can
    reset the env — and a single inf-inf NaN then poisons the whole PPO
    batch through rewards/observations (observed: anymal_c_trajectory
    training went all-NaN abruptly at iteration ~1759, round 4). The sim's
    base_vel_limit cap prevents the overflow in the first place (ref
    Isaac Gym max_linear/angular_velocity, legged_robot_config.py:121-122);
    this guard is the env-level backstop: non-finite envs are replaced by
    ``safe_state`` values and reported so the caller force-terminates them
    (termination penalty + reset, the same path as an illegal contact).

    Round 5: ``explosion_vel`` also flags envs whose base velocity is
    finite but non-physical — a rare per-env contact resonance can ring
    AT the 1000 m/s velocity cap without ever going inf, and a single
    such env then contributes ~-1e4/step to the batch-mean reward and
    ~1e10 to value targets, destroying learning for everyone (the a1
    round-5 divergence: reward -272 -> -3934 while 99.9% of envs were
    healthy). No legged robot legitimately exceeds tens of m/s; flagged
    envs are reset through the same force-terminate path.

    Returns ``(sanitized_robot, bad_mask)``.
    """
    bad = ~(jnp.isfinite(robot.base_pos).all(-1)
            & jnp.isfinite(robot.base_quat).all(-1)
            & jnp.isfinite(robot.q).all(-1)
            & jnp.isfinite(robot.v).all(-1))
    bad = bad | (jnp.max(jnp.abs(robot.v[..., :6]), axis=-1) > explosion_vel)

    def fix(x, s):
        m = bad.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, s, x)

    return jax.tree.map(fix, robot, safe_state), bad
