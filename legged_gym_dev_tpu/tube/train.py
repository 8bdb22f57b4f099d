"""Tube-width network training loop (JAX/optax).

Re-design of the reference trainer (ref: deep_tube_learning/train_tube.py)
minus the Hydra/wandb plumbing: datasets come from ``tube.datasets``, the
model is the functional ``MLP``, losses from ``tube.losses``, optimization by
optax with a jitted step. Mirrors the reference loop's behaviors: grad-norm
tracking, per-epoch dataset ``update`` (alpha resampling), periodic eval
(coverage = fraction fw >= w, ref: deep_tube_learning/utils.py:144-213),
and best/latest checkpoint tracking (ref: train_tube.py:59-144).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .datasets import HorizonTubeDataset, TubeDataset
from .models import MLP


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 100
    batch_size: int = 1024
    learning_rate: float = 1e-3
    eval_every: int = 10
    test_split: float = 0.2
    seed: int = 0
    grad_clip: float = 0.0  # 0 disables


@dataclasses.dataclass
class TrainResult:
    model: MLP
    best_model: MLP
    history: List[Dict]


def coverage(fw: np.ndarray, w: np.ndarray) -> float:
    """"Proportion Correct": fraction of targets covered by the predicted
    tube (ref: deep_tube_learning/utils.py:158-165)."""
    return float(np.mean(np.all(fw >= w, axis=-1)))


def train_tube(
    dataset,
    model: MLP,
    loss_fn: Callable,
    cfg: TrainConfig = TrainConfig(),
) -> TrainResult:
    """Train a tube network on a TubeDataset or HorizonTubeDataset."""
    rng = np.random.default_rng(cfg.seed)
    horizon = isinstance(dataset, HorizonTubeDataset)
    train_ds, test_ds = dataset.random_split(1.0 - cfg.test_split, rng=rng)

    tx = optax.adam(cfg.learning_rate)
    if cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    opt_state = tx.init(model)

    @jax.jit
    def step(model, opt_state, xb, yb):
        def batch_loss(m):
            return loss_fn(m(xb), yb, xb)

        loss, grads = jax.value_and_grad(batch_loss)(model)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, model)
        return optax.apply_updates(model, updates), opt_state, loss, gnorm

    @jax.jit
    def predict(model, xb):
        return model(xb)

    def sample(ds, batch):
        if horizon:
            return ds.sample_batch(rng, batch)
        idx = rng.integers(0, len(ds), size=batch)
        return ds.data[idx], ds.target[idx]

    def evaluate(ds):
        xb, yb = sample(ds, min(4096, max(len(ds), 1) * (8 if horizon else 1)))
        fw = np.asarray(predict(model, jnp.asarray(xb)))
        return {
            "coverage": coverage(fw, yb),
            "eval_mean_err": float(np.mean(np.abs(fw - yb))),
        }

    history: List[Dict] = []
    best_model, best_loss = model, float("inf")
    steps_per_epoch = max(
        1, (len(train_ds) * (8 if horizon else 1)) // cfg.batch_size
    )
    for epoch in range(cfg.epochs):
        train_ds.update(rng)
        losses, gnorms = [], []
        for _ in range(steps_per_epoch):
            xb, yb = sample(train_ds, cfg.batch_size)
            model, opt_state, loss, gnorm = step(
                model, opt_state, jnp.asarray(xb), jnp.asarray(yb)
            )
            losses.append(float(loss))
            gnorms.append(float(gnorm))
        rec = {"epoch": epoch, "loss": float(np.mean(losses)),
               "grad_norm": float(np.mean(gnorms))}
        if (epoch + 1) % cfg.eval_every == 0 or epoch == cfg.epochs - 1:
            rec.update(evaluate(test_ds))
            # Best by lowest loss (ref train_tube.py:35-37): coverage is
            # monotone in over-prediction, so maximizing it would lock in
            # the most conservative (widest-tube) checkpoint.
            if rec["loss"] <= best_loss:
                best_loss, best_model = rec["loss"], model
        history.append(rec)
    return TrainResult(model=model, best_model=best_model, history=history)


def train_tube_streaming(
    loader,
    model: MLP,
    loss_fn: Callable,
    cfg: TrainConfig = TrainConfig(),
    n_threads: int = 2,
) -> TrainResult:
    """Train from a streaming shard loader (tube.shards.NativeTubeLoader /
    NumpyTubeLoader) instead of an in-memory TubeDataset.

    The native loader's worker threads assemble the next shuffled batches
    while the jitted step runs, so datasets larger than host memory stream
    at full device rate. Eval uses the first batches of a held-out-seed
    epoch (the loader streams; there is no materialized split).
    """
    tx = optax.adam(cfg.learning_rate)
    if cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    opt_state = tx.init(model)

    @jax.jit
    def step(model, opt_state, xb, yb):
        def batch_loss(m):
            return loss_fn(m(xb), yb, xb)

        loss, grads = jax.value_and_grad(batch_loss)(model)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, model)
        return optax.apply_updates(model, updates), opt_state, loss, gnorm

    @jax.jit
    def predict(model, xb):
        return model(xb)

    def evaluate():
        it = loader.epoch(seed=cfg.seed + 10_000, batch=4096,
                          n_threads=n_threads, shuffle=True)
        xb, yb = next(iter(it))
        fw = np.asarray(predict(model, jnp.asarray(xb)))
        return {
            "coverage": coverage(fw, yb),
            "eval_mean_err": float(np.mean(np.abs(fw - yb))),
        }

    history: List[Dict] = []
    best_model, best_loss = model, float("inf")
    for epoch in range(cfg.epochs):
        losses, gnorms = [], []
        for xb, yb in loader.epoch(seed=cfg.seed + epoch,
                                   batch=cfg.batch_size,
                                   n_threads=n_threads, shuffle=True):
            if xb.shape[0] < cfg.batch_size:
                continue  # drop ragged tail (keeps the jit cache to 1 entry)
            model, opt_state, loss, gnorm = step(
                model, opt_state, jnp.asarray(xb), jnp.asarray(yb)
            )
            losses.append(float(loss))
            gnorms.append(float(gnorm))
        rec = {"epoch": epoch,
               "loss": float(np.mean(losses)) if losses else float("nan"),
               "grad_norm": float(np.mean(gnorms)) if gnorms else 0.0}
        if (epoch + 1) % cfg.eval_every == 0 or epoch == cfg.epochs - 1:
            rec.update(evaluate())
            if rec["loss"] <= best_loss:
                best_loss, best_model = rec["loss"], model
        history.append(rec)
    return TrainResult(model=model, best_model=best_model, history=history)


def conformal_width_scale(model: MLP, ds_val, alpha: float = 0.9,
                          batch: int = 8192, per_step: bool = True,
                          rng=None) -> float:
    """Split-conformal tube-width multiplier on held-out data.

    Computes the smallest scalar ``s`` such that the scaled tube
    ``s * model(x)`` covers the held-out targets at level ``alpha``:
    the alpha-quantile of the per-sample required scale ``w / fw``.
    ``per_step=True`` targets the per-step coverage metric the closed-loop
    evaluation reports (``evaluate_tube_on_mpc_trace``); ``False`` targets
    whole-window coverage (every step of the horizon covered — strictly
    more conservative). Distribution-free finite-sample marginal coverage
    on exchangeable data is the standard split-conformal guarantee; the
    executed closed-loop trajectories shift distribution, so the flagship
    reports achieved closed-loop coverage alongside (the gap was the
    round-3 VERDICT's under-calibration finding: one-step coverage 0.9,
    executed 0.879).

    Apply with ``model.replace(out_scale=jnp.asarray(s))`` (compounds with
    an existing out_scale, which ``model(x)`` already includes here).
    """
    rng = rng or np.random.default_rng(0)
    if hasattr(ds_val, "sample_batch"):                 # HorizonTubeDataset
        xb, yb = ds_val.sample_batch(rng, batch)
    else:
        idx = rng.integers(0, len(ds_val), size=min(batch, len(ds_val)))
        xb, yb = ds_val.data[idx], ds_val.target[idx]
    fw = np.asarray(model(jnp.asarray(xb)))
    ratio = np.asarray(yb) / np.maximum(fw, 1e-6)
    if not per_step:
        ratio = np.max(ratio, axis=-1)
    return float(np.quantile(ratio.reshape(-1), alpha, method="higher"))


def evaluate_rollout_recursive(model: MLP, w0, z_rest, v, H_rev: int):
    """Recursively roll a one-step tube model along a trajectory
    (ref: evaluation/evaluate_tube_simple.py:55-146 pattern): feed the
    model's own prediction back as the width input.

    Args are single-trajectory arrays: w0 scalar, z_rest (T, n-2), v (T, m).
    Returns predicted widths (T,).
    """
    T = v.shape[0]

    def body(w_prev, t):
        x = jnp.concatenate(
            [jnp.atleast_1d(w_prev), z_rest[t], v[t]]
        )
        w_next = model(x)[0]
        return w_next, w_next

    _, ws = jax.lax.scan(body, jnp.asarray(w0), jnp.arange(T))
    return ws
