"""Sweep the AL-GN iteration schedule at bench shapes; report throughput,
feasibility, and outer_used distribution, plus solution drift vs the
default schedule (accuracy guard: drift must stay <<1e-3)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

setup_tpu_runtime()

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.core import make_rom
from legged_gym_dev_tpu.solver import ALConfig, PROBLEM_DICT, TrajOptParams
from legged_gym_dev_tpu.solver.fast_tube import solve_tube_fast_batched

N, H_REV, B = 50, 10, 1024
prob = PROBLEM_DICT["gap"]
pm = make_rom("SingleInt2D", prob["dt"], [-prob["pos_max"]] * 2,
              [prob["pos_max"]] * 2, [-prob["vel_max"]] * 2,
              [prob["vel_max"]] * 2)
Q = 10 * np.eye(2)
p = TrajOptParams.create(pm, N, H_REV, Q, Q, prob["start"], prob["goal"],
                         prob["obs"]["c"], prob["obs"]["r"], Qw=0.0, w_max=1.0)
rng = np.random.default_rng(0)
p_batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), p)
p_batch = p_batch.replace(
    z0=p_batch.z0 + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)), jnp.float32),
    zf=p_batch.zf + jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)), jnp.float32),
    obs_c=p_batch.obs_c + jnp.asarray(rng.uniform(-0.05, 0.05, (B, 2, 2)),
                                      jnp.float32),
    obs_r=p_batch.obs_r * jnp.asarray(rng.uniform(0.85, 1.0, (B, 2)),
                                      jnp.float32),
)


def run(cfg):
    solve = jax.jit(lambda pb: solve_tube_fast_batched(
        pb, N, H_REV, tube_kind="l1", scaling=0.5, cfg=cfg,
        warm_start="interpolate", tube_ws="evaluate"))
    out = solve(p_batch)
    np.asarray(out.z)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = solve(p_batch)
        np.asarray(out.z)
        ts.append(time.perf_counter() - t0)
    return out, B / min(ts)


ref_out, ref_rate = run(ALConfig())
ref_z = np.asarray(ref_out.z)
ref_feas = np.asarray(ref_out.sol.viol) < 1e-3
ou = np.asarray(ref_out.sol.outer_used)
print(f"default 20x10x10: {ref_rate:7.1f} solves/s  feas={ref_feas.mean():.4f} "
      f"outer_used p50={np.percentile(ou,50):.0f} p90={np.percentile(ou,90):.0f} "
      f"p99={np.percentile(ou,99):.0f} max={ou.max()}")

for (o, i, ls) in [(14, 10, 10), (12, 10, 10), (12, 8, 10), (14, 8, 8),
                   (12, 8, 8), (10, 8, 8), (12, 6, 8), (10, 6, 8),
                   # keep outers (feasibility needs them), trim inners/ls
                   (20, 8, 10), (20, 8, 8), (20, 6, 8), (24, 6, 8),
                   (20, 5, 8), (24, 5, 8), (28, 4, 8)]:
    cfg = ALConfig(outer_iters=o, inner_iters=i, ls_iters=ls)
    out, rate = run(cfg)
    feas = np.asarray(out.sol.viol) < 1e-3
    # drift measured only on scenarios feasible under BOTH schedules
    both = feas & ref_feas
    drift = np.abs(np.asarray(out.z) - ref_z)[both].max() if both.any() else -1
    print(f"{o:2d}x{i:2d}x{ls:2d}        : {rate:7.1f} solves/s  "
          f"feas={feas.mean():.4f}  z-drift(feas∩feas)={drift:.2e}")
