from .al_solver import ALConfig, ALSolution, solve_al, solve_al_batched
from .trajopt import (
    PROBLEM_DICT,
    TrajOptParams,
    TrajOptSolution,
    build_nlp_fns,
    get_warm_start,
    make_bounds,
    pack_x,
    solve_nominal,
    solve_tube,
    solve_tube_batched,
    unpack_x,
)
from .tube_dynamics import get_tube_dynamics
from .debug import (
    compute_constraint_violation,
    generate_col_names,
    segment_constraint_violation,
    trace_to_csv,
)

__all__ = [
    "compute_constraint_violation",
    "generate_col_names",
    "segment_constraint_violation",
    "trace_to_csv",
    "ALConfig",
    "ALSolution",
    "solve_al",
    "solve_al_batched",
    "PROBLEM_DICT",
    "TrajOptParams",
    "TrajOptSolution",
    "build_nlp_fns",
    "get_warm_start",
    "make_bounds",
    "pack_x",
    "unpack_x",
    "solve_nominal",
    "solve_tube",
    "solve_tube_batched",
    "get_tube_dynamics",
]
