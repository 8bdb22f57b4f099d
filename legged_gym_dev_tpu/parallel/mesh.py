"""Device-mesh / sharding helpers for multi-chip scaling.

The reference is single-GPU (a dead `--horovod` flag aside; SURVEY.md §2.2);
this framework's parallel axis is the scenario/env batch ("dp"): solver
scenario pytrees and env state shard over it, network parameters replicate,
and XLA inserts the psum/all-gather collectives over ICI when the jitted
train/solve step consumes both. DCN enters only at the multi-host scenario
fan-out boundary (same program, larger mesh).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]).reshape(n), (axis,))


def make_host_mesh(n_hosts: int, chips_per_host: int,
                   devices=None) -> Mesh:
    """2-axis ``(dcn, ici)`` mesh modeling the multi-host topology.

    Axis 0 ("dcn") is the host boundary — collectives crossing it ride the
    slow data-center network; axis 1 ("ici") is the intra-host chip
    interconnect. The scenario batch shards over BOTH axes
    (``P(("dcn", "ici"))`` via ``shard_batch(axis=("dcn", "ici"))``); each
    SQP solve stays chip-local (no collectives in the solve program — the
    BASELINE >=0.85x-linear multi-host target requires nothing crossing
    DCN except tiny convergence-stat reductions). On real pods pass
    ``jax.devices()`` laid out so consecutive groups of
    ``chips_per_host`` share a host (jax's default device order); here the
    topology is modeled on the virtual CPU mesh.
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = n_hosts * chips_per_host
    if len(devs) < n:
        raise ValueError(f"need {n} devices for a ({n_hosts}, "
                         f"{chips_per_host}) mesh, have {len(devs)}")
    return Mesh(np.array(devs[:n]).reshape(n_hosts, chips_per_host),
                ("dcn", "ici"))


def shard_batch(tree, mesh: Mesh, axis="dp",
                batch_size: Optional[int] = None):
    """Shard every leaf's leading axis over the mesh; scalars replicate.

    ``axis`` may be a tuple of mesh axis names (e.g. ``("dcn", "ici")`` on
    a host mesh) to shard the leading dim over their product.

    ``batch_size``: when given, ONLY leaves whose leading dim equals it are
    sharded — without it the divisibility heuristic can grab non-batch
    leading axes (e.g. an LSTM state shaped (2, B*nj, 8) or a (4, 2)
    command-range table at mesh sizes 2/4) and force a reshard every step.
    """
    dp = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 \
                and x.shape[0] % mesh.devices.size == 0 \
                and (batch_size is None or x.shape[0] == batch_size):
            return jax.device_put(x, dp)
        return jax.device_put(x, repl)

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), tree)


# ---------------------------------------------------------------------------
# HLO collective introspection (multi-host dryrun / test assertions)
# ---------------------------------------------------------------------------

def parse_replica_groups(attr: str, n_devices: int):
    """Parse an HLO ``replica_groups=`` attribute into device-id groups.

    Handles the three textual forms XLA emits: ``{}`` (one group of all
    devices), explicit ``{{0,1},{2,3}}``, and iota
    ``[g,s]<=[d0,...]T(p0,...)``.
    """
    import re

    attr = attr.strip()
    if attr in ("{}", "{{}}"):
        return [list(range(n_devices))]
    if attr.startswith("{"):
        groups = []
        for grp in attr.strip("{}").split("},{"):
            ids = [int(t) for t in grp.replace("{", "").replace("}", "")
                   .split(",") if t.strip() != ""]
            if ids:
                groups.append(ids)
        return groups
    m = re.match(r"\[(\d+),(\d+)\]<=\[([\d,]+)\](?:T\(([\d,]+)\))?", attr)
    if not m:
        return []
    g, s = int(m.group(1)), int(m.group(2))
    dims = [int(d) for d in m.group(3).split(",")]
    v = np.arange(int(np.prod(dims))).reshape(dims)
    if m.group(4):
        v = v.transpose([int(p) for p in m.group(4).split(",")])
    return v.reshape(g, s).tolist()


def hlo_collective_crosses_hosts(hlo: str, n_devices: int,
                                 chips_per_host: int) -> bool:
    """True iff some all-reduce in ``hlo`` has a replica group spanning
    more than one host (host id = device id // chips_per_host, matching
    ``make_host_mesh``'s row-major device layout). Stronger than checking
    the mere presence of an all-reduce: an intra-host reduction's groups
    stay inside one host's id range and must not satisfy this."""
    import re

    for m in re.finditer(
            r"all-reduce[^\n]*?replica_groups=("
            r"\{\{[^=]*?\}\}|\{\}|\[\d+,\d+\]<=\[[\d,]+\](?:T\([\d,]+\))?)",
            hlo):
        for grp in parse_replica_groups(m.group(1), n_devices):
            if len({d // chips_per_host for d in grp}) > 1:
                return True
    return False


def tree_bytes(tree) -> int:
    """Total parameter bytes of a pytree (DCN gradient-traffic budget)."""
    return int(sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)))
