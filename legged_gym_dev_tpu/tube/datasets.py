"""Tube-width dataset builders.

Re-design of the reference dataset constructors
(ref: deep_tube_learning/datasets.py). Raw rollout data arrives as arrays
(from the JAX collectors in ``tube.collect``) instead of wandb pickle
artifacts; construction is host-side numpy preprocessing (one-time, not a hot
path) and the resulting fixed-shape arrays feed jitted training steps.

Semantics preserved:
- ``sliding_window`` history stacking with stride dN and zeroed-input start
  padding (ref :61-70).
- Scalar (w = ||pz_x - z||), vector (per-dim |err|), alpha-conditioned
  (quantile level appended to inputs, resampled per epoch), signed
  error-dynamics, and one-shot horizon (H_rev past errors + z0 rest +
  H_rev+H_fwd inputs -> H_fwd future widths) variants.
- ``done``-masked rows dropped; contiguous random split (ref :107-121).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class RolloutData:
    """Raw tracking rollouts: leading axis = episodes, second = time.

    Matches the per-epoch arrays logged by the reference collector
    (ref: data_collection_trajectory.py:94-149): ``z``/``pz_x`` have T+1
    steps, ``v``/``done`` have T.
    """

    z: np.ndarray      # (E, T+1, n) planned ROM states
    v: np.ndarray      # (E, T, m) ROM inputs
    pz_x: np.ndarray   # (E, T+1, n) achieved robot projections
    done: np.ndarray   # (E, T) termination flags

    def __post_init__(self):
        # Last step of every episode marked done so concatenating episodes
        # cannot create spurious transitions (ref datasets.py:20-25).
        self.done = np.asarray(self.done, bool).copy()
        self.done[:, -1] = True

    @classmethod
    def concatenate(cls, parts) -> "RolloutData":
        return cls(
            z=np.concatenate([p.z for p in parts], axis=0),
            v=np.concatenate([p.v for p in parts], axis=0),
            pz_x=np.concatenate([p.pz_x for p in parts], axis=0),
            done=np.concatenate([p.done for p in parts], axis=0),
        )


def get_slice(data: np.ndarray, i: int, dN: int, m: int) -> np.ndarray:
    """Shift history back by i*dN steps, padding with the initial row whose
    input dims are zeroed (ref datasets.py:61-66)."""
    T = data.shape[-2]
    slc = np.flip(np.arange(T - i * dN - 1, -1, step=-dN))
    start = data[:, :1, :].copy()
    start[:, :, -m:] = 0.0
    pad = np.repeat(start, T - len(slc), axis=-2)
    return np.concatenate((pad, data[:, slc, :]), axis=-2)


def sliding_window(data: np.ndarray, N: int, dN: int, m: int) -> np.ndarray:
    """Stack N history slices along the feature axis (ref datasets.py:69-70)."""
    return np.concatenate([get_slice(data, i, dN, m) for i in range(N)],
                          axis=-1)


@dataclasses.dataclass
class TubeDataset:
    """Flat (input, target) arrays + epoch-level ``update`` hook."""

    data: np.ndarray
    target: np.ndarray

    @property
    def input_dim(self) -> int:
        return self.data.shape[1]

    @property
    def output_dim(self) -> int:
        return self.target.shape[1]

    def __len__(self) -> int:
        return self.data.shape[0]

    def update(self, rng: Optional[np.random.Generator] = None) -> None:
        """Per-epoch refresh (no-op except alpha datasets)."""

    def random_split(self, split_proportion: float,
                     rng: Optional[np.random.Generator] = None):
        """Contiguous random split (ref datasets.py:107-121)."""
        rng = rng or np.random.default_rng()
        split_len = int(len(self) * split_proportion)
        idx = int(rng.integers(len(self) - split_len))
        a = dataclasses.replace(
            self, data=self.data[idx: idx + split_len],
            target=self.target[idx: idx + split_len],
        )
        b = dataclasses.replace(
            self,
            data=np.vstack((self.data[:idx], self.data[idx + split_len:])),
            target=np.vstack((self.target[:idx], self.target[idx + split_len:])),
        )
        return a, b


def _flatten_drop_done(data, target, done):
    E, T = data.shape[:2]
    data = data.reshape(E * T, -1)
    target = target.reshape(E * T, -1)
    keep = ~done.reshape(E * T)
    return data[keep], target[keep]


def scalar_tube_dataset(r: RolloutData, N: int = 1, dN: int = 1,
                        recursive: bool = False) -> TubeDataset:
    """w = ||pz_x - z||; input = [w, sliding(z_rest, v)] (ref :174-210)."""
    z, pz_x = r.z[:, :-1], r.pz_x[:, :-1]
    w = np.linalg.norm(pz_x - z, axis=-1)
    w_p1 = np.linalg.norm(r.pz_x[:, 1:] - r.z[:, 1:], axis=-1)
    z_rest = z[:, :, 2:]
    m = r.v.shape[-1]
    if recursive:
        feats = np.concatenate((w[..., None], z_rest, r.v), axis=-1)
        data = sliding_window(feats, N, dN, m)
    else:
        zv = sliding_window(np.concatenate((z_rest, r.v), axis=-1), N, dN, m)
        data = np.concatenate((w[..., None], zv), axis=-1)
    data, target = _flatten_drop_done(data, w_p1[..., None], r.done)
    return TubeDataset(data.astype(np.float32), target.astype(np.float32))


def vector_tube_dataset(r: RolloutData, N: int = 1, dN: int = 1) -> TubeDataset:
    """Per-dim |err| targets (ref :248-278)."""
    z, pz_x = r.z[:, :-1], r.pz_x[:, :-1]
    w = np.abs(pz_x - z)
    w_p1 = np.abs(r.pz_x[:, 1:] - r.z[:, 1:])
    feats = np.concatenate((w, z, r.v), axis=-1)
    data = sliding_window(feats, N, dN, r.v.shape[-1])
    data, target = _flatten_drop_done(data, w_p1, r.done)
    return TubeDataset(data.astype(np.float32), target.astype(np.float32))


@dataclasses.dataclass
class AlphaTubeDataset(TubeDataset):
    """Quantile level appended to inputs, resampled each epoch (ref :281-356)."""

    def update(self, rng: Optional[np.random.Generator] = None) -> None:
        rng = rng or np.random.default_rng()
        self.data[:, -1] = rng.uniform(size=len(self)).astype(np.float32)


def alpha_scalar_tube_dataset(r: RolloutData, N: int = 1, dN: int = 1,
                              rng=None) -> AlphaTubeDataset:
    z, pz_x = r.z[:, :-1], r.pz_x[:, :-1]
    w = np.linalg.norm(pz_x - z, axis=-1)
    w_p1 = np.linalg.norm(r.pz_x[:, 1:] - r.z[:, 1:], axis=-1)
    feats = np.concatenate((w[..., None], z, r.v), axis=-1)
    data = sliding_window(feats, N, dN, r.v.shape[-1])
    data, target = _flatten_drop_done(data, w_p1[..., None], r.done)
    rng = rng or np.random.default_rng()
    alpha = rng.uniform(size=(data.shape[0], 1))
    data = np.hstack((data, alpha))
    return AlphaTubeDataset(data.astype(np.float32), target.astype(np.float32))


def alpha_vector_tube_dataset(r: RolloutData, N: int = 1, dN: int = 1,
                              rng=None) -> AlphaTubeDataset:
    z, pz_x = r.z[:, :-1], r.pz_x[:, :-1]
    w = np.abs(pz_x - z)
    w_p1 = np.abs(r.pz_x[:, 1:] - r.z[:, 1:])
    feats = np.concatenate((w, z, r.v), axis=-1)
    data = sliding_window(feats, N, dN, r.v.shape[-1])
    data, target = _flatten_drop_done(data, w_p1, r.done)
    rng = rng or np.random.default_rng()
    alpha = rng.uniform(size=(data.shape[0], 1))
    data = np.hstack((data, alpha))
    return AlphaTubeDataset(data.astype(np.float32), target.astype(np.float32))


def error_dynamics_dataset(r: RolloutData, N: int = 1, dN: int = 1) -> TubeDataset:
    """Signed error targets (ref :359-389)."""
    z, pz_x = r.z[:, :-1], r.pz_x[:, :-1]
    w = pz_x - z
    w_p1 = r.pz_x[:, 1:] - r.z[:, 1:]
    feats = np.concatenate((w, z, r.v), axis=-1)
    data = sliding_window(feats, N, dN, r.v.shape[-1])
    data, target = _flatten_drop_done(data, w_p1, r.done)
    return TubeDataset(data.astype(np.float32), target.astype(np.float32))


@dataclasses.dataclass
class HorizonTubeDataset:
    """One-shot horizon dataset with random time-index sampling (ref :124-171).

    Input per sample: [w_{t-H_rev:t}, z_t[2:], v_{t-H_rev:t+H_fwd}] ->
    target w_{t+1:t+H_fwd+1}; layout matches the one-shot NN tube dynamics
    consumed by the solver (solver/tube_dynamics.py: nn_oneshot_tube).

    ``valid`` marks (episode, t) window starts whose full horizon contains
    no environment reset: with auto-resetting collectors a window crossing a
    done stitches two episodes together and its error spike poisons the
    learned quantile.
    """

    w: np.ndarray       # (E, H_rev + T) padded width series
    z_rest: np.ndarray  # (E, H_rev + T, n-2)
    v: np.ndarray       # (E, H_rev + T, m)
    H_fwd: int
    H_rev: int
    valid: Optional[np.ndarray] = None   # (n_valid, 2) [episode, t] pairs

    @property
    def input_dim(self) -> int:
        return (self.H_rev + self.z_rest.shape[-1]
                + (self.H_rev + self.H_fwd) * self.v.shape[-1])

    @property
    def output_dim(self) -> int:
        return self.H_fwd

    def __len__(self) -> int:
        return self.w.shape[0]

    def sample_batch(self, rng: np.random.Generator, batch: int):
        """Random (episode, time) samples -> (input, target) arrays."""
        Hf, Hr = self.H_fwd, self.H_rev
        if self.valid is not None and len(self.valid) > 0:
            pick = rng.integers(0, len(self.valid), size=batch)
            eps, ts = self.valid[pick, 0], self.valid[pick, 1]
        else:
            eps = rng.integers(0, len(self), size=batch)
            # Valid window start indices (ref datasets.py:139).
            ts = rng.integers(Hr, self.w.shape[1] - Hf - 1, size=batch)
        xs, ys = [], []
        for e, t in zip(eps, ts):
            w_hist = self.w[e, t - Hr:t]
            z0 = self.z_rest[e, t]
            v_win = self.v[e, t - Hr:t + Hf]
            # Column-major input flattening to match the solver's NN input
            # layout (casadi reshape parity; tube_dynamics.nn_oneshot_tube).
            xs.append(np.concatenate([w_hist, z0, v_win.T.reshape(-1)]))
            ys.append(self.w[e, t + 1:t + Hf + 1])
        return (np.stack(xs).astype(np.float32),
                np.stack(ys).astype(np.float32))

    def random_split(self, split_proportion: float, rng=None):
        rng = rng or np.random.default_rng()
        split_len = int(len(self) * split_proportion)
        idx = int(rng.integers(len(self) - split_len))
        sel = np.arange(idx, idx + split_len)
        rest = np.r_[0:idx, idx + split_len:len(self)]

        def sub(ep_idx):
            valid = None
            if self.valid is not None:
                remap = -np.ones(len(self), np.int64)
                remap[ep_idx] = np.arange(len(ep_idx))
                mask = np.isin(self.valid[:, 0], ep_idx)
                valid = self.valid[mask].copy()
                valid[:, 0] = remap[valid[:, 0]]
            return dataclasses.replace(
                self, w=self.w[ep_idx], z_rest=self.z_rest[ep_idx],
                v=self.v[ep_idx], valid=valid,
            )

        return sub(sel), sub(rest)

    def update(self, rng=None):
        pass


def scalar_horizon_tube_dataset(r: RolloutData, H_fwd: int = 50,
                                H_rev: int = 10,
                                drop_done_episodes: bool = True
                                ) -> HorizonTubeDataset:
    """Pad the series back H_rev steps with the initial state / zero inputs
    (ref :213-245).

    ``drop_done_episodes``: restrict sampling to windows whose full
    [t-H_rev, t+H_fwd] span contains no environment reset — a crash/reset
    inside the window stitches unrelated episodes together and its error
    spike poisons the learned quantile (the reference drops done rows for
    one-step datasets; this is the horizon-window analog).
    """
    valid = None
    if drop_done_episodes:
        E, T = r.done.shape
        pairs = []
        for e in range(E):
            done_t = np.flatnonzero(r.done[e, :-1])
            ok = np.ones(T, bool)
            for d in done_t:
                ok[max(0, d - H_fwd - 1): d + H_rev + 1] = False
            # Window start t indexes the PADDED series (length T + H_rev):
            # the target slice w[t+1 : t+H_fwd+1] needs t <= T+H_rev-H_fwd-1.
            for t in range(H_rev, T + H_rev - H_fwd - 1):
                if ok[t - H_rev]:
                    pairs.append((e, t))
        valid = (np.asarray(pairs, np.int64) if pairs else None)
    z, pz_x, v = r.z[:, :-1], r.pz_x[:, :-1], r.v
    v = np.concatenate(
        (np.zeros((v.shape[0], H_rev, v.shape[2])), v), axis=1
    )
    z = np.concatenate((np.repeat(z[:, :1], H_rev, axis=1), z), axis=1)
    pz_x = np.concatenate((np.repeat(pz_x[:, :1], H_rev, axis=1), pz_x), axis=1)
    w = np.linalg.norm(pz_x - z, axis=-1)
    return HorizonTubeDataset(
        w=w.astype(np.float32),
        z_rest=z[:, :, 2:].astype(np.float32),
        v=v.astype(np.float32),
        H_fwd=H_fwd, H_rev=H_rev,
        valid=valid,
    )


DATASET_REGISTRY = {
    "ScalarTubeDataset": scalar_tube_dataset,
    "VectorTubeDataset": vector_tube_dataset,
    "AlphaScalarTubeDataset": alpha_scalar_tube_dataset,
    "AlphaVectorTubeDataset": alpha_vector_tube_dataset,
    "ErrorDynamicsDataset": error_dynamics_dataset,
    "ScalarHorizonTubeDataset": scalar_horizon_tube_dataset,
}
