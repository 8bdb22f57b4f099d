"""Same-session A/B: Pallas kernel on the PRODUCTION solve path.

Runs the exact bench.py solve (solve_tube_fast_batched, randomized
scenarios, certification outside the timed loop) with
ALConfig.linsolve in {"thomas", "pallas"} interleaved — the end-to-end
number the standalone kernel win (docs/PERF.md "Pallas kernel") predicts
~1.2-1.3x on. Chip-to-chip variance is ~5-8%, so each variant runs
`REPS` interleaved rounds and we report the per-variant minimum.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

    setup_tpu_runtime()
    from bench import run_mode

    cases = [
        ("l1", 4096),
        ("l1", 1024),
        ("NN_oneshot", 1024),
    ]
    for tube, B in cases:
        res = {}
        for linsolve in ("thomas", "pallas"):
            r = run_mode(tube, B, linsolve=linsolve)
            res[linsolve] = r
            print(f"{tube} B={B} {linsolve}: {r['value']} solves/s "
                  f"(wall {r['solve_wall_s']}s, feas {r['feasible_frac']:.4f}, "
                  f"verdicts {r['verdicts']})", flush=True)
        sp = res["pallas"]["value"] / res["thomas"]["value"]
        print(json.dumps({
            "case": f"{tube}_B{B}", "thomas": res["thomas"]["value"],
            "pallas": res["pallas"]["value"], "speedup": round(sp, 3),
            "feas_thomas": res["thomas"]["feasible_frac"],
            "feas_pallas": res["pallas"]["feasible_frac"],
        }), flush=True)


if __name__ == "__main__":
    main()
