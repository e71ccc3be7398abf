"""Masked kNN construction vs numpy brute force."""

import numpy as np
import jax.numpy as jnp

from decompdiff_tpu.ops.knn import knn_neighbors


def brute_force_knn(pos, mask, k):
    B, N, _ = pos.shape
    nbrs = np.zeros((B, N, k), np.int64)
    valid = np.zeros((B, N, k), bool)
    for b in range(B):
        for i in range(N):
            d = np.linalg.norm(pos[b] - pos[b, i], axis=-1)
            d[i] = np.inf
            d[~mask[b]] = np.inf
            order = np.argsort(d)[:k]
            nbrs[b, i] = order
            valid[b, i] = np.isfinite(d[order]) & mask[b, i]
    return nbrs, valid


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    B, N, k = 3, 20, 6
    pos = rng.normal(size=(B, N, 3)).astype(np.float32)
    mask = rng.random((B, N)) < 0.8
    mask[:, :k + 2] = True  # ensure enough real nodes
    got_idx, got_mask = knn_neighbors(jnp.asarray(pos), jnp.asarray(mask), k)
    exp_idx, exp_mask = brute_force_knn(pos, mask, k)
    got_idx, got_mask = np.asarray(got_idx), np.asarray(got_mask)
    np.testing.assert_array_equal(got_mask, exp_mask)
    # compare as sets per row (ties may order differently)
    for b in range(B):
        for i in range(N):
            if mask[b, i]:
                assert set(got_idx[b, i][got_mask[b, i]]) == \
                    set(exp_idx[b, i][exp_mask[b, i]]), (b, i)


def test_knn_excludes_self_and_padding():
    rng = np.random.default_rng(1)
    pos = rng.normal(size=(1, 10, 3)).astype(np.float32)
    mask = np.ones((1, 10), bool)
    mask[0, 7:] = False
    idx, m = knn_neighbors(jnp.asarray(pos), jnp.asarray(mask), 4)
    idx, m = np.asarray(idx), np.asarray(m)
    for i in range(7):
        sel = idx[0, i][m[0, i]]
        assert i not in sel
        assert np.all(sel < 7)
    # padded dst rows are fully invalid
    assert not m[0, 7:].any()


def test_knn_fewer_real_than_k():
    pos = np.asarray(np.random.default_rng(2).normal(size=(1, 8, 3)),
                     np.float32)
    mask = np.zeros((1, 8), bool)
    mask[0, :3] = True
    idx, m = knn_neighbors(jnp.asarray(pos), jnp.asarray(mask), 5)
    m = np.asarray(m)
    # each real node has exactly 2 valid neighbors (the other real nodes)
    assert m[0, :3].sum(-1).tolist() == [2, 2, 2]
