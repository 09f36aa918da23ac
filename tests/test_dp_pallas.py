"""Pallas DP kernel parity vs the XLA scan DP and the host DP.

Runs in interpreter mode on the CPU test mesh; compiled-TPU execution is
exercised by bench.py. Scores must be bitwise identical."""

import random

import numpy as np
import pytest

from pbdagcon_tpu.alignment import normalize_gaps
from pbdagcon_tpu.oracle.graph import AlnGraph
from pbdagcon_tpu.ops.dp import batch_scores, choose_layout, pad_batch
from pbdagcon_tpu.ops.linearize import backtrack, host_scores, linearize
from pbdagcon_tpu.simulate import NoiseProfile, simulate_pileup


def _lins(seeds, length=150, cov=20, noise=None):
    out = []
    for seed in seeds:
        rng = random.Random(seed)
        backbone, alns = simulate_pileup(
            rng, f"p{seed}", length, cov, noise or NoiseProfile()
        )
        g = AlnGraph(backbone)
        for a in alns:
            g.add_aln(normalize_gaps(a))
        g.merge_nodes()
        out.append(linearize(g, sid=f"p{seed}"))
    return out


def _v_bucket(lins):
    need = max(l.n for l in lins)
    for v in (64, 128, 256, 512, 1024, 2048, 4096):
        if need <= v:
            return v
    raise ValueError(need)


def test_pallas_matches_xla_and_host():
    lins = _lins(range(4))
    V = _v_bucket(lins)
    W, K = choose_layout(lins)
    xla = batch_scores(lins, V, W, K, backend="xla")
    pallas = batch_scores(lins, V, W, K, backend="pallas")
    for i, lin in enumerate(lins):
        hs = host_scores(lin)
        np.testing.assert_array_equal(xla[i, : lin.n], hs)
        np.testing.assert_array_equal(pallas[i, : lin.n], hs)
        assert backtrack(lin, pallas[i, : lin.n]) == backtrack(lin, hs)


def test_pallas_high_depth_long_edges():
    lins = _lins(
        [50, 51], length=100, cov=80,
        noise=NoiseProfile(sub=0.04, ins=0.18, dele=0.09, max_ins_run=4),
    )
    V = _v_bucket(lins)
    W, K = choose_layout(lins)
    assert K >= 8  # the point of this case: long edges present
    pallas = batch_scores(lins, V, W, K, backend="pallas")
    for i, lin in enumerate(lins):
        np.testing.assert_array_equal(pallas[i, : lin.n], host_scores(lin))


def test_pallas_nonmultiple_batch():
    """Batch of 3 targets must survive lane padding to 128."""
    lins = _lins([60, 61, 62], length=80, cov=10)
    V = _v_bucket(lins)
    W, K = choose_layout(lins)
    pallas = batch_scores(lins, V, W, K, backend="pallas")
    assert pallas.shape[0] == 3
    for i, lin in enumerate(lins):
        np.testing.assert_array_equal(pallas[i, : lin.n], host_scores(lin))
