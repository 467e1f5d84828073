"""Comparator-network machinery in ops/filters.py.

Batcher sort correctness and pruned selection-network parity — these
guard the L.A.Cosmic median filters, so failures here corrupt cosmic-ray
rejection silently.
"""

import numpy as np
import jax.numpy as jnp

from blackbox_tpu.ops.filters import (apply_ops, batcher_pairs,
                                      selection_ops, select_rank)


def _run_net(pairs, x):
    v = [x[:, i] for i in range(x.shape[1])]
    v = apply_ops(v, tuple(("ce", a, b) for a, b in pairs))
    return np.stack([np.asarray(c) for c in v], axis=1)


def test_batcher_sorts():
    rng = np.random.default_rng(0)
    for m in (2, 4, 8, 16, 32, 64):
        x = rng.standard_normal((500, m)).astype(np.float32)
        out = _run_net(batcher_pairs(m), jnp.asarray(x))
        assert np.array_equal(out, np.sort(x, axis=1)), f"m={m}"
        # 0/1 inputs (the 0-1 principle: correctness on these implies
        # correctness on all inputs)
        b = (rng.uniform(size=(2000, m)) < rng.uniform(size=(2000, 1)))
        out = _run_net(batcher_pairs(m), jnp.asarray(b.astype(np.float32)))
        assert np.array_equal(out, np.sort(b, axis=1).astype(np.float32))


def test_selection_rank_parity():
    rng = np.random.default_rng(1)
    for n, rank in ((9, 4), (25, 12), (49, 24), (3, 1), (15, 7)):
        x = rng.standard_normal((800, n)).astype(np.float32)
        views = [jnp.asarray(x[:, i]) for i in range(n)]
        got = np.asarray(select_rank(views, rank))
        want = np.sort(x, axis=1)[:, rank]
        assert np.array_equal(got, want), (n, rank)


def test_selection_cheaper_than_sort():
    m = 32
    nsort = len(batcher_pairs(m))
    nsel = len(selection_ops(m, (12,)))
    assert nsel < nsort, (nsel, nsort)


def test_sorted_column_network_sorts():
    # the odd-even merge tree over pre-sorted columns must produce a
    # full sort for every wire ordering (0-1 principle brute force)
    from blackbox_tpu.ops.filters import sorted_column_network
    rng = np.random.default_rng(3)
    for k in (3, 5, 7):
        pairs, order = sorted_column_network(k)
        m = k * k
        x = rng.standard_normal((400, m)).astype(np.float32)
        # pre-sort each column's wires (dx*k+r for r in range(k))
        for dx in range(k):
            x[:, dx * k:(dx + 1) * k] = np.sort(
                x[:, dx * k:(dx + 1) * k], axis=1)
        out = _run_net(pairs, jnp.asarray(x))
        assert np.array_equal(out[:, list(order)],
                              np.sort(x, axis=1)), k
        # fewer comparators than sorting from scratch (the whole point)
        from blackbox_tpu.ops.filters import transposition_pairs
        assert len(pairs) + k * len(transposition_pairs(k)) < \
            len(transposition_pairs(m))


def test_sc_select_ops_rank_parity():
    from blackbox_tpu.ops.filters import sc_select_ops
    rng = np.random.default_rng(4)
    for k in (3, 5, 7):
        m = k * k
        ops, wires = sc_select_ops(k, (m // 2,))
        x = rng.standard_normal((400, m)).astype(np.float32)
        for dx in range(k):
            x[:, dx * k:(dx + 1) * k] = np.sort(
                x[:, dx * k:(dx + 1) * k], axis=1)
        v = [jnp.asarray(x[:, i]) for i in range(m)]
        got = np.asarray(apply_ops(v, ops)[wires[0]])
        assert np.array_equal(got, np.sort(x, axis=1)[:, m // 2]), k


def test_median_filter_matches_scipy_interior():
    from scipy import ndimage
    from blackbox_tpu.ops.filters import median_filter
    rng = np.random.default_rng(2)
    img = rng.standard_normal((64, 80)).astype(np.float32)
    for k in (3, 5, 7):
        got = np.asarray(median_filter(jnp.asarray(img), k, strip_rows=16))
        want = ndimage.median_filter(img, size=k)
        p = k // 2
        assert np.allclose(got[p:-p, p:-p], want[p:-p, p:-p]), k
