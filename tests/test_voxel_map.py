"""SparseVoxelMap artifact: HDF5 round-trip (reference schema,
mapping_utils.py:469-541) and derived 2D maps."""

import numpy as np

from avlmaps_tpu.map.voxel_map import (
    SparseVoxelMap, save_clip_sparse_map,
    load_clip_sparse_map,
)


def make_map(rng, gs=32, vh=8, d=16, n=100):
    m = SparseVoxelMap.empty(gs, vh, d)
    pos = rng.integers(0, [gs, gs, vh], size=(n, 3)).astype(np.int32)
    # dedupe voxels
    _, keep = np.unique(pos[:, 0] * gs * vh + pos[:, 1] * vh + pos[:, 2],
                        return_index=True)
    pos = pos[keep]
    n = pos.shape[0]
    m.grid_feat = rng.normal(size=(n, d)).astype(np.float32)
    m.grid_pos = pos
    m.weight = rng.uniform(0.1, 5, size=n).astype(np.float32)
    m.grid_rgb = rng.integers(0, 255, size=(n, 3)).astype(np.uint8)
    m.occupied_ids[pos[:, 0], pos[:, 1], pos[:, 2]] = np.arange(n)
    m.mapped_iters = set(range(7))
    return m


def test_hdf5_roundtrip(tmp_path, rng):
    m = make_map(rng)
    path = tmp_path / "vlmaps.h5df"
    m.save(path)
    m2 = SparseVoxelMap.load(path)
    np.testing.assert_array_equal(m2.grid_feat, m.grid_feat)
    np.testing.assert_array_equal(m2.grid_pos, m.grid_pos)
    np.testing.assert_array_equal(m2.weight, m.weight)
    np.testing.assert_array_equal(m2.occupied_ids, m.occupied_ids)
    np.testing.assert_array_equal(m2.grid_rgb, m.grid_rgb)
    assert m2.mapped_iters == m.mapped_iters
    assert m2.gs == m.gs and m2.vh == m.vh


def test_reference_schema_dataset_names(tmp_path, rng):
    import h5py
    m = make_map(rng)
    path = tmp_path / "m.h5df"
    m.save(path)
    with h5py.File(path, "r") as f:
        assert set(f.keys()) == {"mapped_iter_list", "grid_feat", "grid_pos",
                                 "weight", "occupied_ids", "grid_rgb"}


def test_clip_sparse_map_roundtrip(tmp_path, rng):
    feats = rng.normal(size=(10, 768)).astype(np.float32)
    poses = [np.eye(4) for _ in range(10)]
    path = tmp_path / "clip_sparse_map.h5df"
    save_clip_sparse_map(path, feats, poses)
    f2, p2 = load_clip_sparse_map(path)
    np.testing.assert_array_equal(f2, feats)
    assert p2.shape == (10, 4, 4)


def test_obstacle_map(rng):
    m = make_map(rng, gs=16, vh=10)
    obs = m.obstacle_map(h_min=0.0, h_max=0.45, cs=0.05)
    # reference semantics (map.py:79-95): occupied where any voxel with
    # slot id > 0 in the height band exists
    heights = np.arange(10) * 0.05
    band = (heights > 0) & (heights < 0.45)
    expected = ((m.occupied_ids[..., band] > 0).sum(axis=2) == 0)
    np.testing.assert_array_equal(obs.astype(bool), expected)


def test_top_down_height(rng):
    m = make_map(rng, gs=16, vh=10)
    hmax = m.top_down_height()
    expected = np.full((16, 16), -1, np.int32)
    for i in range(m.num_occupied):
        r, c, h = m.grid_pos[i]
        expected[r, c] = max(expected[r, c], h)
    np.testing.assert_array_equal(hmax, expected)
