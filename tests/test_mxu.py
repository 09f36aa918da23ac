"""Exactness tests for the MXU histogram/scatter toolkit (ops/mxu.py).

These primitives replace `lax.sort`-based histograms, full-grid
searchsorteds, and known-rank transports inside the device graph build
(ops/devbuild_jax.py); bit-exactness against NumPy is the contract that
keeps the build's oracle parity intact.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from pbdagcon_tpu.ops import mxu


@pytest.mark.parametrize("seed,B,N,D,chunk", [
    (0, 3, 700, 257, 256),
    (1, 2, 4096, 1026, 4096),
    (2, 1, 129, 8208, 64),
    (3, 4, 1000, 300, 1000),
])
def test_hist_and_lohi_exact(seed, B, N, D, chunk):
    rng = np.random.default_rng(seed)
    v = rng.integers(0, D, (B, N))
    m = rng.random((B, N)) < 0.7
    h = np.asarray(mxu.mxu_hist(jnp.asarray(v), jnp.asarray(m), D,
                                chunk=chunk))
    ref = np.stack([np.bincount(v[i][m[i]], minlength=D) for i in range(B)])
    assert (h == ref).all()
    lo, hi = mxu.hist_lohi(jnp.asarray(v), jnp.asarray(m), D, chunk=chunk)
    lo, hi = np.asarray(lo), np.asarray(hi)
    for i in range(B):
        sv = np.sort(v[i][m[i]])
        assert (lo[i] == np.searchsorted(sv, np.arange(D), "left")).all()
        assert (hi[i] == np.searchsorted(sv, np.arange(D), "right")).all()


def test_hist_all_invalid_and_empty_bins():
    v = jnp.asarray([[5, 5, 5, 2]])
    m = jnp.asarray([[False, False, False, False]])
    assert (np.asarray(mxu.mxu_hist(v, m, 8)) == 0).all()


def test_scatter_permutation_multi_payload():
    rng = np.random.default_rng(7)
    B, N = 3, 1500
    perm = np.stack([rng.permutation(N) for _ in range(B)])
    p1 = rng.integers(0, 1 << 16, (B, N))
    p2 = rng.integers(0, 1 << 14, (B, N))
    o1, o2 = mxu.mxu_scatter(
        jnp.asarray(perm), jnp.ones((B, N), bool),
        (jnp.asarray(p1), jnp.asarray(p2)), N, chunk=512,
    )
    inv = np.argsort(perm, axis=-1)
    assert (np.asarray(o1) == np.take_along_axis(p1, inv, -1)).all()
    assert (np.asarray(o2) == np.take_along_axis(p2, inv, -1)).all()


def test_scatter_compaction_partial_fill():
    rng = np.random.default_rng(8)
    B, N, D = 4, 2000, 256
    fl = rng.random((B, N)) < 0.1
    rank = np.cumsum(fl, -1) - 1
    pos = np.broadcast_to(np.arange(N), (B, N)).copy()
    (out,) = mxu.mxu_scatter(
        jnp.asarray(rank), jnp.asarray(fl), (jnp.asarray(pos),), D,
        chunk=512,
    )
    out = np.asarray(out)
    for i in range(B):
        idx = np.nonzero(fl[i])[0][:D]
        assert (out[i, : len(idx)] == idx).all()
        assert (out[i, len(idx):] == 0).all()


def test_scatter_24bit_payload():
    rng = np.random.default_rng(9)
    B, N = 2, 300
    perm = np.stack([rng.permutation(N) for _ in range(B)])
    p = rng.integers(0, 1 << 24, (B, N))
    (o,) = mxu.mxu_scatter(
        jnp.asarray(perm), jnp.ones((B, N), bool), (jnp.asarray(p),), N,
        chunk=128, max_payload=1 << 24,
    )
    inv = np.argsort(perm, axis=-1)
    assert (np.asarray(o) == np.take_along_axis(p, inv, -1)).all()


def test_scatter_ranks_beyond_domain_dropped():
    # ranks >= D (overflow rows) must not corrupt in-domain cells.
    ranks = jnp.asarray([[0, 1, 9, 2]])
    valid = jnp.asarray([[True, True, True, True]])
    (o,) = mxu.mxu_scatter(ranks, valid, (jnp.asarray([[7, 8, 9, 10]]),), 4)
    assert np.asarray(o).tolist() == [[7, 8, 10, 0]]


@pytest.mark.parametrize("T,N,maxv", [(300, 700, 1 << 8), (1026, 4096, 1 << 16),
                                      (513, 200, 1 << 24), (6144, 300, 1 << 30)])
def test_gather_exact(T, N, maxv):
    rng = np.random.default_rng(T + N)
    B = 3
    tbl = rng.integers(0, maxv, (B, T))
    idx = rng.integers(0, T, (B, N))
    out = np.asarray(mxu.mxu_gather(
        jnp.asarray(tbl), jnp.asarray(idx), max_val=maxv))
    assert (out == np.take_along_axis(tbl, idx, axis=-1)).all()


def test_gather_invalid_reads_zero():
    tbl = jnp.asarray([[5, 6, 7, 8]])
    idx = jnp.asarray([[2, 0, 3]])
    valid = jnp.asarray([[True, False, True]])
    out = np.asarray(mxu.mxu_gather(tbl, idx, max_val=16, valid=valid))
    assert out.tolist() == [[7, 0, 8]]
