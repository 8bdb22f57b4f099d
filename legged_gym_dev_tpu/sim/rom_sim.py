"""ROM-only environment: physics-free tracking sim for fast tube data.

TPU-native re-design of the reference's ``CustomSim``
(ref: deep_tube_learning/custom_sim.py:5-103): a simple model (e.g. a
double integrator "robot") tracks a single-integrator ROM trajectory without
rigid-body physics — the de-facto fake backend of the data-collection
pipeline (ref: data_collection_trajectory.py:87-90) and the fixture for
pipeline tests without the full simulator (SURVEY.md §4).

Functional API: ``reset(key) -> state``, ``step(state, action) -> state``;
everything jit/vmap/scan-able with explicit key threading.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.rom import RomDynamics
from ..trajgen.generator import TrajectoryGenerator, TrajGenState


from ..core.maths import masked_update as _mwhere  # noqa: E402


@struct.dataclass
class RomSimState:
    key: jax.Array
    root_states: jax.Array       # (B, model.n)
    traj_gen: TrajGenState
    trajectory: jax.Array        # (B, N, rom.n) current interpolated window


@struct.dataclass
class RomSim:
    """ROM-tracking sim: ``model`` is the "robot", ``rom`` the reference.

    Mirrors reference cfg fields: init-state noise bounds
    (ref custom_sim.py:34-35), ROM-distance randomization on reset
    (ref :80-85 and legged_robot_trajectory.py:248-253).
    """

    model: RomDynamics
    traj_gen: TrajectoryGenerator
    init_noise_lower: jax.Array   # (model.n,)
    init_noise_upper: jax.Array   # (model.n,)
    max_rom_distance: jax.Array   # (rom.n,)
    zero_rom_dist_llh: jax.Array  # () probability of zero initial ROM offset
    randomize_rom_distance: bool = struct.field(pytree_node=False, default=True)
    num_envs: int = struct.field(pytree_node=False, default=1)

    @property
    def rom(self) -> RomDynamics:
        return self.traj_gen.rom

    @classmethod
    def create(cls, model, traj_gen, num_envs, init_noise_lower,
               init_noise_upper, max_rom_distance, zero_rom_dist_llh=0.05,
               randomize_rom_distance=True):
        return cls(
            model=model,
            traj_gen=traj_gen,
            init_noise_lower=jnp.asarray(init_noise_lower, jnp.float32),
            init_noise_upper=jnp.asarray(init_noise_upper, jnp.float32),
            max_rom_distance=jnp.asarray(max_rom_distance, jnp.float32),
            zero_rom_dist_llh=jnp.asarray(zero_rom_dist_llh, jnp.float32),
            randomize_rom_distance=bool(randomize_rom_distance),
            num_envs=int(num_envs),
        )

    # ------------------------------------------------------------------
    def reset(self, key: jax.Array) -> RomSimState:
        B = self.num_envs
        tg_state = self.traj_gen.init_state(jax.random.fold_in(key, 0), B)
        state = RomSimState(
            key=key,
            root_states=jnp.zeros((B, self.model.n), jnp.float32),
            traj_gen=tg_state,
            trajectory=jnp.zeros(
                (B, self.traj_gen.N, self.rom.n), jnp.float32
            ),
        )
        return self.reset_idx(state, jnp.ones((B,), bool))

    def reset_idx(self, state: RomSimState, mask: jax.Array) -> RomSimState:
        """Randomize root states + rebuild trajectories where mask
        (ref custom_sim.py:87-93)."""
        B = self.num_envs
        k1, k2, k3, k_next = jax.random.split(state.key, 4)
        roots = jax.random.uniform(
            k1, (B, self.model.n),
            minval=self.init_noise_lower, maxval=self.init_noise_upper,
        )
        root_states = _mwhere(mask, roots, state.root_states)

        # ROM starts at the robot projection, optionally offset (ref :80-85).
        p_zx = self.rom.proj_z(root_states)
        if self.randomize_rom_distance:
            offset_on = jax.random.uniform(k2, (B,)) > self.zero_rom_dist_llh
            offset = jax.random.uniform(
                k3, p_zx.shape,
                minval=-self.max_rom_distance, maxval=self.max_rom_distance,
            )
            p_zx = jnp.where((mask & offset_on)[:, None], p_zx + offset, p_zx)

        tg_state = self.traj_gen.reset(state.traj_gen, mask, p_zx)
        state = state.replace(
            key=k_next, root_states=root_states, traj_gen=tg_state
        )
        # Reference reset ends with a zero-action step (ref :93) — but only
        # for the RESET envs: this runs inside the per-step masked
        # auto-reset, and an unmasked trailing step would double-advance
        # every other env's clock each policy step.
        stepped = self.step(state, jnp.zeros((B, self.model.m), jnp.float32))
        tg_masked = jax.tree.map(
            lambda new, old: _mwhere(mask, new, old)
            if new.ndim >= 1 and new.shape[0] == B else new,
            stepped.traj_gen, state.traj_gen,
        )
        return state.replace(
            root_states=_mwhere(mask, stepped.root_states, state.root_states),
            traj_gen=tg_masked,
            trajectory=_mwhere(mask, stepped.trajectory, state.trajectory),
        )

    # ------------------------------------------------------------------
    def step(self, state: RomSimState, action: jax.Array) -> RomSimState:
        """model.f + traj_gen tick + window refresh (ref custom_sim.py:71-75)."""
        roots = self.model.f(state.root_states, action)
        tg_state = self.traj_gen.step(state.traj_gen)
        return state.replace(
            root_states=roots,
            traj_gen=tg_state,
            trajectory=self.traj_gen.get_trajectory(tg_state),
        )

    def get_observations(self, state: RomSimState) -> jax.Array:
        """[root_state, next planned z, next planned v] (ref :95-100)."""
        return jnp.concatenate(
            [
                state.root_states,
                state.trajectory[:, 0, :],
                state.traj_gen.v_trajectory[:, 1, :],
            ],
            axis=1,
        )

    def get_state(self, state: RomSimState) -> jax.Array:
        return state.root_states
