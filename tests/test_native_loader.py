"""Native C++ tube data loader vs the numpy reference pipeline."""
import numpy as np
import pytest

from legged_gym_dev_tpu.native import load_dataloader
from legged_gym_dev_tpu.tube.datasets import (
    RolloutData,
    scalar_tube_dataset,
    vector_tube_dataset,
)
from legged_gym_dev_tpu.tube.shards import (
    NativeTubeLoader,
    NumpyTubeLoader,
    frames_for_variant,
    make_loader,
    window_srcmap,
    write_rollout_shards,
)


def make_rollout(rng, E=6, T=40, n=4, m=2):
    return RolloutData(
        z=rng.normal(size=(E, T + 1, n)).astype(np.float32),
        v=rng.normal(size=(E, T, m)).astype(np.float32),
        pz_x=rng.normal(size=(E, T + 1, n)).astype(np.float32),
        done=rng.uniform(size=(E, T)) < 0.05,
    )


def test_window_srcmap_matches_get_slice():
    """The index map must reproduce get_slice's stride-aligned indexing."""
    from legged_gym_dev_tpu.tube.datasets import get_slice

    rng = np.random.default_rng(0)
    T, F, m = 17, 5, 2
    data = rng.normal(size=(3, T, F)).astype(np.float32)
    for N, dN in [(1, 1), (3, 1), (3, 2), (4, 5)]:
        sm = window_srcmap(T, N, dN)
        for i in range(N):
            ref = get_slice(data, i, dN, m)
            pad_row = data[:, 0].copy()
            pad_row[:, -m:] = 0.0
            got = np.where(
                (sm[i] >= 0)[None, :, None],
                data[:, np.maximum(sm[i], 0)], pad_row[:, None, :])
            np.testing.assert_allclose(got, ref, rtol=0, atol=0)


@pytest.mark.skipif(load_dataloader() is None,
                    reason="no native toolchain available")
@pytest.mark.parametrize("N,dN", [(1, 1), (3, 2)])
def test_native_matches_dataset_builder(tmp_path, N, dN):
    """Unshuffled native stream == tube.datasets.scalar_tube_dataset rows."""
    rng = np.random.default_rng(1)
    r = make_rollout(rng)
    ref = scalar_tube_dataset(r, N=N, dN=dN)
    paths = write_rollout_shards(str(tmp_path), [r], variant="scalar")
    ld = NativeTubeLoader(paths, N=N, dN=dN, n_zero_tail=r.v.shape[-1])
    assert ld.num_rows == len(ref)
    assert ld.input_dim == ref.input_dim
    ds = ld.load_all()
    np.testing.assert_allclose(ds.data, ref.data, atol=1e-6)
    np.testing.assert_allclose(ds.target, ref.target, atol=1e-6)
    ld.close()


@pytest.mark.skipif(load_dataloader() is None,
                    reason="no native toolchain available")
def test_native_matches_numpy_loader_multishard(tmp_path):
    """Native and numpy loaders agree across multiple shards + variants."""
    rng = np.random.default_rng(2)
    rollouts = [make_rollout(rng), make_rollout(rng, E=4, T=40)]
    for variant, builder in [("vector", vector_tube_dataset)]:
        paths = write_rollout_shards(str(tmp_path / variant), rollouts,
                                     variant=variant)
        _, _, _, _, m = frames_for_variant(rollouts[0], variant)
        nat = NativeTubeLoader(paths, N=2, dN=1, n_zero_tail=m)
        npy = NumpyTubeLoader(paths, N=2, dN=1, n_zero_tail=m)
        a, b = nat.load_all(), npy.load_all()
        np.testing.assert_allclose(a.data, b.data, atol=1e-6)
        np.testing.assert_allclose(a.target, b.target, atol=1e-6)
        # and both equal the in-memory dataset builder on the concatenation
        ref = builder(RolloutData.concatenate(rollouts), N=2, dN=1)
        np.testing.assert_allclose(a.data, ref.data, atol=1e-6)
        nat.close()


@pytest.mark.skipif(load_dataloader() is None,
                    reason="no native toolchain available")
def test_native_shuffled_epoch_covers_all_rows(tmp_path):
    """A shuffled threaded epoch yields every kept row exactly once."""
    rng = np.random.default_rng(3)
    r = make_rollout(rng, E=5, T=30)
    paths = write_rollout_shards(str(tmp_path), [r], variant="scalar")
    ld = NativeTubeLoader(paths, N=2, dN=1, n_zero_tail=r.v.shape[-1])
    ref = ld.load_all()
    seen = []
    total = 0
    for x, y in ld.epoch(seed=7, batch=33, n_threads=3, shuffle=True):
        assert x.shape[1] == ld.input_dim
        total += x.shape[0]
        seen.append(x)
    assert total == ld.num_rows
    seen = np.concatenate(seen)
    # same multiset of rows (sort both lexicographically)
    key = np.lexsort(seen.T)
    key_ref = np.lexsort(ref.data.T)
    np.testing.assert_allclose(seen[key], ref.data[key_ref], atol=1e-6)
    # different seeds give different orders
    first = next(iter(ld.epoch(seed=8, batch=33, shuffle=True)))[0]
    assert not np.allclose(first, seen[: first.shape[0]])
    ld.close()


def test_make_loader_falls_back(tmp_path):
    rng = np.random.default_rng(4)
    r = make_rollout(rng, E=2, T=20)
    paths = write_rollout_shards(str(tmp_path), [r], variant="scalar")
    ld = make_loader(paths, N=1, dN=1, n_zero_tail=r.v.shape[-1])
    ref = scalar_tube_dataset(r, N=1, dN=1)
    ds = ld.load_all()
    np.testing.assert_allclose(
        np.sort(ds.data, axis=0), np.sort(ref.data, axis=0), atol=1e-6)
