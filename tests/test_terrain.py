"""Terrain generator tests (ref: legged_gym/utils/terrain.py + terrain_utils)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legged_gym_dev_tpu.utils.terrain import (
    SubTerrain,
    Terrain,
    TerrainCfg,
    discrete_obstacles_terrain,
    gap_terrain,
    height_scan,
    pit_terrain,
    pyramid_sloped_terrain,
    pyramid_stairs_terrain,
    random_uniform_terrain,
    stepping_stones_terrain,
)


def sub():
    return SubTerrain(width=80, length=80, vertical_scale=0.005,
                      horizontal_scale=0.1)


def test_pyramid_slope_rises_to_center():
    t = sub()
    pyramid_sloped_terrain(t, slope=0.2, platform_size=1.0)
    h = t.height_field_raw * t.vertical_scale
    assert h[40, 40] > h[5, 5]
    assert abs(h[40, 40] - 0.2 * 4.0) < 0.2  # slope * half-length ≈ 0.8

def test_stairs_monotone_rings():
    t = sub()
    pyramid_stairs_terrain(t, step_width=0.31, step_height=0.1,
                           platform_size=1.0)
    h = t.height_field_raw
    assert h[40, 40] == h.max()
    assert h[0, 0] == h.min() == 0
    # Step quantization: number of distinct levels ≈ rings.
    assert 5 < len(np.unique(h)) < 30


def test_random_uniform_bounds():
    t = sub()
    random_uniform_terrain(t, -0.05, 0.05, rng=np.random.default_rng(0))
    h = t.height_field_raw * t.vertical_scale
    assert -0.06 <= h.min() and h.max() <= 0.06
    assert h.std() > 0.005


def test_gap_and_pit():
    t = sub()
    gap_terrain(t, gap_size=0.5, platform_size=2.0)
    assert t.height_field_raw.min() == -1000
    assert t.height_field_raw[40, 40] == 0
    t2 = sub()
    pit_terrain(t2, depth=0.5, platform_size=2.0)
    assert t2.height_field_raw[40, 40] == -int(0.5 / 0.005)


def test_stepping_stones_and_obstacles():
    t = sub()
    stepping_stones_terrain(t, 0.5, 0.2, 0.05, rng=np.random.default_rng(1))
    assert t.height_field_raw.min() < -100  # deep holes between stones
    t2 = sub()
    discrete_obstacles_terrain(t2, 0.15, 1.0, 2.0, 10,
                               rng=np.random.default_rng(2))
    assert len(np.unique(t2.height_field_raw)) > 1


def test_terrain_grid_curriculum():
    cfg = TerrainCfg(num_rows=4, num_cols=5, curriculum=True, border_size=2.0,
                     terrain_length=4.0, terrain_width=4.0)
    t = Terrain(cfg, num_robots=16, seed=0)
    assert t.env_origins.shape == (4, 5, 3)
    # Origins laid out on the grid.
    np.testing.assert_allclose(t.env_origins[0, 0, :2], [2.0, 2.0])
    np.testing.assert_allclose(t.env_origins[3, 4, :2], [14.0, 18.0])
    # Higher difficulty rows have rougher terrain in the stairs columns.
    assert t.height_field_raw.std() > 0


def test_terrain_fn_matches_heightfield():
    cfg = TerrainCfg(num_rows=2, num_cols=2, curriculum=True, border_size=1.0,
                     terrain_length=4.0, terrain_width=4.0)
    t = Terrain(cfg, num_robots=4, seed=0)
    fn = t.make_terrain_fn()
    # Sample exactly at pixel centers: must match the raw field.
    i, j = 30, 25
    x = i * cfg.horizontal_scale - cfg.border_size
    y = j * cfg.horizontal_scale - cfg.border_size
    h = float(fn(jnp.asarray([[x, y]]))[0])
    expect = t.height_field_raw[i, j] * cfg.vertical_scale
    assert abs(h - expect) < 1e-5
    # Differentiable: gradient exists (contact normal path).
    g = jax.grad(lambda p: fn(p[None, :])[0])(jnp.asarray([x + 0.03, y]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_terrain_value_and_grad_matches_autodiff():
    """The fused analytic height+gradient path (used per-substep by the
    contact model) must agree with autodiff of the sampler away from cell
    boundaries."""
    cfg = TerrainCfg(num_rows=2, num_cols=2, curriculum=True, border_size=1.0,
                     terrain_length=4.0, terrain_width=4.0)
    t = Terrain(cfg, num_robots=4, seed=0)
    fn = t.make_terrain_fn()
    rng = np.random.default_rng(1)
    # Interior points, offset from pixel centers (gradient is unique there).
    xy = jnp.asarray(rng.uniform(0.3, 5.3, (64, 2)) + 0.033, jnp.float32)
    h, g = fn.value_and_grad(xy)
    np.testing.assert_allclose(np.asarray(h), np.asarray(fn(xy)), atol=1e-5)
    g_ad = jax.vmap(jax.grad(lambda p: fn(p[None, :])[0]))(xy)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad),
                               atol=1e-4, rtol=1e-4)


def test_height_scan_shapes():
    cfg = TerrainCfg(num_rows=2, num_cols=2, border_size=1.0,
                     terrain_length=4.0, terrain_width=4.0)
    t = Terrain(cfg, num_robots=4, seed=0)
    fn = t.make_terrain_fn()
    B = 8
    base_pos = jnp.tile(jnp.asarray([2.0, 2.0, 0.5]), (B, 1))
    base_quat = jnp.tile(jnp.asarray([0.0, 0, 0, 1.0]), (B, 1))
    xs = [-0.5, 0.0, 0.5]
    ys = [-0.5, 0.0, 0.5]
    h = height_scan(fn, base_pos, base_quat, xs, ys)
    assert h.shape == (B, 9)
    assert np.all(np.isfinite(np.asarray(h)))
