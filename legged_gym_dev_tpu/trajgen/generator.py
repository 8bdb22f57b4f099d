"""Batched ROM trajectory generation as functional, scan-able JAX state.

TPU-native re-design of the reference ``TrajectoryGenerator`` and its scripted
variants (ref: trajopt/rom_dynamics.py:441-699). The reference mutates member
tensors per index set; here all state lives in an explicit ``TrajGenState``
pytree and every update is a masked (``jnp.where``) batch update, so the whole
generator runs inside ``jit``/``vmap``/``lax.scan`` with no data-dependent
shapes.

Semantics preserved from the reference:
- 4 input modes (sample-hold / ramp / extreme bang-bang / sinusoid) mixed by
  sampled simplex weights (ref :510-566).
- Asynchronous two-rate clock: env loop at ``dt_loop`` vs ROM ticks at
  ``rom.dt``; envs advance the ROM only when ``t >= k*rom.dt`` (ref :568-590).
- Rolling window of ``N*dN`` ROM states with linear interpolation between ROM
  ticks and stride ``dN`` (ref :607-615).
- Stationary-probability masking that zeroes inputs and velocity states
  (ref :507-508, 580-583).
- Reset rebuilds the window by stepping ``N*dN`` ROM ticks (ref :595-605).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..core.rom import DoubleInt2D, RomDynamics, SingleInt2D
from .samplers import UniformSampleHoldDT, UniformWeightSampler


from ..core.maths import masked_update as _mwhere  # noqa: E402


@struct.dataclass
class TrajGenState:
    """All per-env trajectory-generator state (leading batch axis B)."""

    key: jax.Array              # (2,) PRNG key
    t: jax.Array                # (B,) env-loop time
    k: jax.Array                # (B,) ROM tick counter (float for parity)
    t_final: jax.Array          # (B,) current mode expiry time
    weights: jax.Array          # (B, 4) input-mode mixture
    sample_hold_input: jax.Array  # (B, m)
    extreme_input: jax.Array    # (B, m)
    ramp_t_start: jax.Array     # (B,)
    ramp_v_start: jax.Array     # (B, m)
    ramp_v_end: jax.Array       # (B, m)
    sin_mag: jax.Array          # (B, m)
    sin_freq: jax.Array         # (B, m)
    sin_off: jax.Array          # (B, m)
    sin_mean: jax.Array         # (B, m)
    trajectory: jax.Array       # (B, N*dN+1, n)
    v_trajectory: jax.Array     # (B, N*dN, m)
    v: jax.Array                # (B, m) last applied ROM input
    stationary: jax.Array       # (B,) bool
    center: jax.Array           # (B, 2) scripted-circle center


@struct.dataclass
class TrajectoryGenerator:
    """Random-input trajectory generator over a ROM (ref :441-615)."""

    rom: RomDynamics
    t_sampler: UniformSampleHoldDT
    weight_sampler: UniformWeightSampler
    dt_loop: jax.Array
    freq_low: jax.Array
    freq_high: jax.Array
    prob_stationary: jax.Array
    N: int = struct.field(pytree_node=False, default=4)
    dN: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def create(cls, rom, t_sampler, weight_sampler, dt_loop=0.02, N=4, dN=1,
               freq_low=0.01, freq_high=10.0, prob_stationary=0.01):
        return cls(
            rom=rom,
            t_sampler=t_sampler,
            weight_sampler=weight_sampler,
            dt_loop=jnp.asarray(dt_loop, jnp.float32),
            freq_low=jnp.asarray(freq_low, jnp.float32),
            freq_high=jnp.asarray(freq_high, jnp.float32),
            prob_stationary=jnp.asarray(prob_stationary, jnp.float32),
            N=int(N),
            dN=int(dN),
        )

    # ---- state construction ---------------------------------------------
    def init_state(self, key: jax.Array, batch: int) -> TrajGenState:
        n, m = self.rom.n, self.rom.m
        W = self.N * self.dN
        zf = jnp.zeros((batch,), jnp.float32)
        zm = jnp.zeros((batch, m), jnp.float32)
        return TrajGenState(
            key=key,
            t=zf, k=zf, t_final=zf,
            weights=jnp.zeros((batch, 4), jnp.float32),
            sample_hold_input=zm, extreme_input=zm,
            ramp_t_start=zf, ramp_v_start=zm,
            ramp_v_end=jnp.broadcast_to(self.rom.v_min, (batch, m)),
            sin_mag=zm, sin_freq=zm, sin_off=zm, sin_mean=zm,
            trajectory=jnp.zeros((batch, W + 1, n), jnp.float32),
            v_trajectory=jnp.zeros((batch, W, m), jnp.float32),
            v=zm,
            stationary=jnp.zeros((batch,), bool),
            center=jnp.zeros((batch, 2), jnp.float32),
        )

    # ---- resampling (masked) --------------------------------------------
    def resample(self, state: TrajGenState, mask: jax.Array,
                 z: jax.Array) -> TrajGenState:
        """Resample all input-mode params where ``mask`` (ref :510-520)."""
        B, m = z.shape[0], self.rom.m
        keys = jax.random.split(state.key, 3)
        v_min, v_max = self.rom.compute_state_dependent_input_bounds(z)

        # Single consolidated unit-uniform draw for all mode params: one RNG
        # op compiles and runs far faster on TPU than ten separate draws.
        U = jax.random.uniform(keys[0], (B, 7 * m + 2))
        u = lambda i: U[:, i * m:(i + 1) * m]

        sample_hold = v_min + u(0) * (v_max - v_min)
        # Ramp: new start is the clipped previous end; new end resampled
        # (ref :531-534).
        ramp_v_start = self.rom.clip_v_z(z, state.ramp_v_end)
        ramp_v_end = v_min + u(1) * (v_max - v_min)
        ramp_t_start = state.t_final
        # Extreme: per-dim choice of {v_min, 0, v_max} (ref :536-539).
        choice = jnp.floor(u(2) * 3.0).astype(jnp.int32)
        extreme = jnp.where(
            choice == 0, v_min, jnp.where(choice == 1, jnp.zeros_like(v_min), v_max)
        )
        # Sinusoid params (ref :541-545).
        sin_mag = u(3) * (v_max - v_min) / 2.0
        sin_mean = (v_min + sin_mag) + u(4) * (v_max - v_min - 2.0 * sin_mag)
        sin_freq = self.freq_low + u(5) * (self.freq_high - self.freq_low)
        sin_off = -jnp.pi + u(6) * 2.0 * jnp.pi
        t_final = state.t_final + self.t_sampler.sample_from_unit(U[:, 7 * m])
        weights = self.weight_sampler.sample(keys[1], B)
        stationary = U[:, 7 * m + 1] < self.prob_stationary

        return state.replace(
            key=jax.random.fold_in(state.key, 1),
            t_final=jnp.where(mask, t_final, state.t_final),
            weights=_mwhere(mask, weights, state.weights),
            sample_hold_input=_mwhere(mask, sample_hold, state.sample_hold_input),
            extreme_input=_mwhere(mask, extreme, state.extreme_input),
            ramp_t_start=jnp.where(mask, ramp_t_start, state.ramp_t_start),
            ramp_v_start=_mwhere(mask, ramp_v_start, state.ramp_v_start),
            ramp_v_end=_mwhere(mask, ramp_v_end, state.ramp_v_end),
            sin_mag=_mwhere(mask, sin_mag, state.sin_mag),
            sin_freq=_mwhere(mask, sin_freq, state.sin_freq),
            sin_off=_mwhere(mask, sin_off, state.sin_off),
            sin_mean=_mwhere(mask, sin_mean, state.sin_mean),
            stationary=jnp.where(mask, stationary, state.stationary),
        )

    # ---- input synthesis -------------------------------------------------
    def _mode_inputs(self, state: TrajGenState, t: jax.Array):
        const = state.sample_hold_input
        denom = jnp.where(
            jnp.abs(state.t_final - state.ramp_t_start) < 1e-8,
            1.0, state.t_final - state.ramp_t_start,
        )
        frac = ((t - state.ramp_t_start) / denom)[:, None]
        ramp = state.ramp_v_start + (state.ramp_v_end - state.ramp_v_start) * frac
        extreme = state.extreme_input
        sinus = (
            state.sin_mag * jnp.sin(state.sin_freq * t[:, None] + state.sin_off)
            + state.sin_mean
        )
        return const, ramp, extreme, sinus

    def get_input_t(self, state: TrajGenState, z: jax.Array,
                    allow_mask=None) -> tuple:
        """Resample expired modes, then mix the 4 modes (ref :560-566)."""
        expired = state.t > state.t_final
        if allow_mask is not None:
            expired = expired & allow_mask
        state = self.resample(state, expired, z)
        const, ramp, extreme, sinus = self._mode_inputs(state, state.t)
        w = state.weights
        v = (
            w[:, 0:1] * self.rom.clip_v_z(z, const)
            + w[:, 1:2] * self.rom.clip_v_z(z, ramp)
            + w[:, 2:3] * self.rom.clip_v_z(z, extreme)
            + w[:, 3:4] * self.rom.clip_v_z(z, sinus)
        )
        return state, v

    # ---- stepping --------------------------------------------------------
    def step_rom(self, state: TrajGenState, mask: jax.Array,
                 increment_rom_time: bool = False,
                 allow_resample_mask=None) -> TrajGenState:
        """Advance the ROM one tick for envs in ``mask`` (ref :577-590)."""
        z_last = state.trajectory[:, -1, :]
        state, v = self.get_input_t(state, z_last, allow_mask=allow_resample_mask)
        v = jnp.where(state.stationary[:, None], 0.0, v)
        z_next = self.rom.f(z_last, v)
        still = state.stationary[:, None] & self.rom.vel_inds[None, :]
        z_next = jnp.where(still, 0.0, z_next)

        new_traj = jnp.concatenate(
            [state.trajectory[:, 1:, :], z_next[:, None, :]], axis=1
        )
        new_vtraj = jnp.concatenate(
            [state.v_trajectory[:, 1:, :], v[:, None, :]], axis=1
        )
        return state.replace(
            trajectory=_mwhere(mask, new_traj, state.trajectory),
            v_trajectory=_mwhere(mask, new_vtraj, state.v_trajectory),
            v=_mwhere(mask, v, state.v),
            k=jnp.where(mask, state.k + 1.0, state.k),
            t=jnp.where(
                mask & increment_rom_time, state.t + self.rom.dt, state.t
            ) if increment_rom_time else state.t,
        )

    def step(self, state: TrajGenState) -> TrajGenState:
        """One env-loop tick: advance ROM where due, then t += dt_loop
        (ref :568-575)."""
        due = state.t >= state.k * self.rom.dt - 1e-5
        state = self.step_rom(state, due)
        return state.replace(t=state.t + self.dt_loop)

    # ---- reset -----------------------------------------------------------
    def reset(self, state: TrajGenState, mask: jax.Array,
              z: jax.Array) -> TrajGenState:
        """Rebuild the rolling window for envs in ``mask`` (ref :595-605)."""
        W = self.N * self.dN
        n, m = self.rom.n, self.rom.m
        B = z.shape[0]
        traj = jnp.zeros((B, W + 1, n), jnp.float32).at[:, -1, :].set(z)
        k0 = jnp.full((B,), -float(W), jnp.float32)
        t0 = k0 * self.rom.dt
        state = state.replace(
            trajectory=_mwhere(mask, traj, state.trajectory),
            v_trajectory=_mwhere(
                mask, jnp.zeros((B, W, m), jnp.float32), state.v_trajectory
            ),
            k=jnp.where(mask, k0, state.k),
            t=jnp.where(mask, t0, state.t),
            t_final=jnp.where(mask, t0, state.t_final),
        )
        state = self.resample(state, mask, z)

        def body(_, s):
            return self.step_rom(
                s, mask, increment_rom_time=True, allow_resample_mask=mask
            )

        return jax.lax.fori_loop(0, W, body, state)

    # ---- outputs ---------------------------------------------------------
    def get_trajectory(self, state: TrajGenState) -> jax.Array:
        """Window interpolated to the env clock, strided by dN (ref :607-612)."""
        traj0 = state.trajectory[:, :-1, :]
        traj1 = state.trajectory[:, 1:, :]
        alpha = (state.t - (state.k - 1.0) * self.rom.dt) / self.rom.dt
        interp = traj0 + (traj1 - traj0) * alpha[:, None, None]
        return interp[:, :: self.dN, :]

    def get_v_trajectory(self, state: TrajGenState) -> jax.Array:
        return state.v_trajectory[:, :: self.dN, :]


@struct.dataclass
class ZeroTrajectoryGenerator(TrajectoryGenerator):
    """Always-stationary fixture (ref :618-624)."""

    def resample(self, state, mask, z):
        return state.replace(
            stationary=jnp.where(mask, True, state.stationary)
        )

    def get_input_t(self, state, z, allow_mask=None):
        B = z.shape[0]
        return state, jnp.zeros((B, self.rom.m), jnp.float32)


@struct.dataclass
class SquareTrajectoryGenerator(TrajectoryGenerator):
    """Open-loop piecewise square path for SingleInt2D / DoubleInt2D
    (ref :627-674)."""

    def resample(self, state, mask, z):
        return state

    def get_input_t(self, state, z, allow_mask=None):
        B = z.shape[0]
        t = state.t
        v = jnp.zeros((B, self.rom.m), jnp.float32)
        vmax, vmin = self.rom.v_max, self.rom.v_min
        if isinstance(self.rom, DoubleInt2D):
            zmax, zmin = self.rom.z_max, self.rom.z_min
            c0 = zmax[3] / 2 / vmax[1]
            c1 = c0 + (1 - 2 * (0.5 * vmax[1] * c0**2)) / (zmax[3] / 2)
            c2 = c1 + zmin[3] / 2 / vmin[1]
            c3 = c2
            c4 = c3 + zmax[2] / vmax[0]
            c5 = c4 + (1 - 2 * (0.5 * vmax[0] * (c4 - c3) ** 2)) / (zmax[2] / 2)
            c6 = c5 + zmin[2] / vmin[0]
            c7 = c6
            c8 = c7 + zmin[3] / 2 / vmin[1]
            c9 = c8 + (1 - 2 * (0.5 * jnp.abs(vmin[1]) * (c8 - c7) ** 2)) / (
                jnp.abs(zmin[3]) / 2
            )
            c10 = c9 + zmax[3] / 2 / vmax[1]
            c11 = c10
            c12 = c11 + zmin[2] / vmin[0]
            c13 = c12 + (1 - 2 * (0.5 * jnp.abs(vmin[0]) * (c12 - c11) ** 2)) / (
                jnp.abs(zmin[2]) / 2
            )
            c14 = c13 + zmax[2] / vmax[0]
            vy = (
                jnp.where((0 <= t) & (t < c0), vmax[1], 0.0)
                + jnp.where((c1 <= t) & (t < c2), vmin[1], 0.0)
                + jnp.where((c7 <= t) & (t < c8), vmin[1], 0.0)
                + jnp.where((c9 <= t) & (t < c10), vmax[1], 0.0)
            )
            vx = (
                jnp.where((c3 <= t) & (t < c4), vmax[0], 0.0)
                + jnp.where((c5 <= t) & (t < c6), vmin[0], 0.0)
                + jnp.where((c11 <= t) & (t < c12), vmin[0], 0.0)
                + jnp.where((c13 <= t) & (t < c14), vmax[0], 0.0)
            )
            v = jnp.stack([vx, vy], axis=-1)
        elif isinstance(self.rom, SingleInt2D):
            c1 = 2 / vmax[1]
            c2 = c1 + 1 / vmax[0]
            c3 = c2 + 2 / jnp.abs(vmin[1])
            c4 = c3 + 1 / jnp.abs(vmin[0])
            vy = jnp.where((0 <= t) & (t < c1), vmax[1] / 2, 0.0) + jnp.where(
                (c2 <= t) & (t < c3), vmin[1] / 2, 0.0
            )
            vx = jnp.where((c1 <= t) & (t < c2), vmax[0], 0.0) + jnp.where(
                (c3 <= t) & (t < c4), vmin[1], 0.0
            )
            v = jnp.stack([vx, vy], axis=-1)
        else:
            raise ValueError("Square fixture supports SingleInt2D/DoubleInt2D")
        return state, v

    def reset(self, state, mask, z):
        z = jnp.where(self.rom.vel_inds[None, :], 0.0, z)
        return TrajectoryGenerator.reset(self, state, mask, z)


@struct.dataclass
class CircleTrajectoryGenerator(TrajectoryGenerator):
    """Feedback circle tracker for SingleInt2D / DoubleInt2D (ref :677-698)."""

    def resample(self, state, mask, z):
        center = z[:, :2].at[:, 0].add(-0.5)
        return state.replace(center=_mwhere(mask, center, state.center))

    def get_input_t(self, state, z, allow_mask=None):
        t = state.t
        vmax, vmin = self.rom.v_max, self.rom.v_min
        speed = jnp.min(jnp.minimum(vmax, jnp.abs(vmin)))
        if isinstance(self.rom, DoubleInt2D):
            z_des = state.center + 0.5 * jnp.stack(
                [jnp.cos(t / speed), jnp.sin(t / speed)], axis=-1
            )
            v_des = (
                0.5
                * jnp.stack([-jnp.sin(t / speed), jnp.cos(t / speed)], axis=-1)
                / speed
            )
            v = self.rom.clip_v_z(
                z, -4.0 * (z[:, :2] - z_des) - 4.0 * (z[:, 2:] - v_des)
            )
        elif isinstance(self.rom, SingleInt2D):
            e = z - state.center
            v = jnp.stack([-e[:, 1], e[:, 0]], axis=-1)
            vn = jnp.clip(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
            v = v + -(e - 0.5 * e / vn)
            vn2 = jnp.clip(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
            v = v / vn2 * speed
        else:
            raise ValueError("Circle fixture supports SingleInt2D/DoubleInt2D")
        return state, v


TRAJ_GEN_REGISTRY = {
    "TrajectoryGenerator": TrajectoryGenerator,
    "ZeroTrajectoryGenerator": ZeroTrajectoryGenerator,
    "SquareTrajectoryGenerator": SquareTrajectoryGenerator,
    "CircleTrajectoryGenerator": CircleTrajectoryGenerator,
}
