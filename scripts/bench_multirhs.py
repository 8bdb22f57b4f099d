"""Same-session A/B of the round-4 multi-RHS Pallas path.

A: LGDT_PALLAS_MULTIRHS on (factor-once kernel + VMEM-chunked column
substitution for the NN-tube Woodbury solves); B: off (round-3 behavior —
Pallas single-RHS factor, XLA entry-scan for the multi-RHS). Both sides
run bench.py's exact NN_oneshot batch and the closed-loop tick budget in
ONE process (docs/PERF.md A/B convention).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from legged_gym_dev_tpu.utils.runtime import setup_tpu_runtime

    setup_tpu_runtime()
    import bench
    from legged_gym_dev_tpu.solver import staged_scalar as ss

    B = int(os.environ.get("B", "1024"))

    ss._PALLAS_MULTIRHS = False
    off = bench.run_mode("NN_oneshot", B)
    print("NN multirhs=OFF:", off, flush=True)
    ss._PALLAS_MULTIRHS = True
    on = bench.run_mode("NN_oneshot", B)
    print("NN multirhs=ON :", on, flush=True)
    # repeat OFF to bound drift
    ss._PALLAS_MULTIRHS = False
    off2 = bench.run_mode("NN_oneshot", B)
    print("NN multirhs=OFF (repeat):", off2, flush=True)

    ss._PALLAS_MULTIRHS = True
    tb_on = bench.measure_tick_budget(Bs=(1024, 2048))
    print("tick multirhs=ON :", tb_on, flush=True)
    ss._PALLAS_MULTIRHS = False
    tb_off = bench.measure_tick_budget(Bs=(1024, 2048))
    print("tick multirhs=OFF:", tb_off, flush=True)


if __name__ == "__main__":
    main()
