"""Parity: linearizer + device DP + host backtrack == oracle graph engine.

The tensor path (SPEC.md §3) must reproduce the oracle (SPEC.md §2) bit
for bit: identical float32 node scores, identical best path, identical
consensus fragments. Fuzzed over simulated pileups at several depths and
noise levels (the reference's own oracle is golden-file diffing,
SURVEY.md §4; with the mount empty our oracle is normative).
"""

import random

import numpy as np
import pytest

from pbdagcon_tpu.alignment import normalize_gaps
from pbdagcon_tpu.oracle.graph import AlnGraph
from pbdagcon_tpu.ops.dp import batch_scores, dp_scores, pad_batch
from pbdagcon_tpu.ops.linearize import (
    backtrack,
    consensus_from_path,
    graph_from_group,
    host_scores,
    linearize,
)
from pbdagcon_tpu.simulate import NoiseProfile, simulate_pileup


def _bucket(x: int, ladder=(64, 128, 256, 512, 1024, 2048, 4096, 8192)) -> int:
    for v in ladder:
        if x <= v:
            return v
    raise ValueError(f"{x} exceeds ladder")


def _oracle_graph(backbone, alns):
    g = AlnGraph(backbone)
    for a in alns:
        g.add_aln(normalize_gaps(a))
    g.merge_nodes()
    return g


CASES = [
    (0, 200, 10, NoiseProfile()),
    (1, 500, 30, NoiseProfile()),
    (2, 300, 60, NoiseProfile(sub=0.03, ins=0.15, dele=0.08)),
    (3, 120, 100, NoiseProfile(sub=0.05, ins=0.2, dele=0.1, max_ins_run=5)),
    (4, 800, 20, NoiseProfile(sub=0.005, ins=0.03, dele=0.02)),
]


@pytest.mark.parametrize("seed,length,cov,noise", CASES)
def test_linear_path_matches_oracle(seed, length, cov, noise):
    rng = random.Random(seed)
    backbone, alns = simulate_pileup(
        rng, f"t{seed}", length, cov, noise
    )
    g = _oracle_graph(backbone, alns)
    oracle_path = g.best_path()
    oracle_cns = g.consensus_from_path(oracle_path, min_weight=cov // 3, min_length=10)

    lin = linearize(g, sid=f"t{seed}")
    assert lin.n == sum(
        1
        for v in range(len(g.base))
        if not g.deleted[v] and v not in (g.enter, g.exit)
    )

    # Host DP scores must equal oracle scores bitwise (node by node).
    hs = host_scores(lin)
    # Rebuild mapping linear index -> graph node via linearize's order:
    # verify through path/consensus equality instead (mapping is internal).

    path = backtrack(lin, hs)
    cns = consensus_from_path(lin, path, min_weight=cov // 3, min_length=10)
    assert [(c.range, c.seq) for c in cns] == [
        (c.range, c.seq) for c in oracle_cns
    ]

    # Device (XLA scan) scores must equal host scores bitwise.
    from pbdagcon_tpu.ops.dp import choose_layout

    V = _bucket(lin.n)
    W, K = choose_layout([lin])
    ds = batch_scores([lin], V, W, K)[0, : lin.n]
    np.testing.assert_array_equal(ds, hs)

    dpath = backtrack(lin, ds)
    assert dpath == path


def test_batched_mixed_targets():
    lins = []
    expected = []
    for seed in range(6):
        rng = random.Random(100 + seed)
        backbone, alns = simulate_pileup(rng, f"b{seed}", 150, 25, NoiseProfile())
        g = _oracle_graph(backbone, alns)
        expected.append(g.consensus(min_weight=8, min_length=10))
        lins.append(linearize(g, sid=f"b{seed}"))
    V = _bucket(max(l.n for l in lins))
    scores = batch_scores(lins, V, W=16, K=64)
    for i, lin in enumerate(lins):
        path = backtrack(lin, scores[i, : lin.n])
        cns = consensus_from_path(lin, path, min_weight=8, min_length=10)
        assert [(c.range, c.seq) for c in cns] == [
            (c.range, c.seq) for c in expected[i]
        ]


def test_perfect_reads_give_backbone():
    rng = random.Random(7)
    backbone, alns = simulate_pileup(
        rng, "perfect", 300, 12, NoiseProfile(sub=0, ins=0, dele=0),
        min_read_frac=1.0,
    )
    g = _oracle_graph(backbone, alns)
    lin = linearize(g)
    scores = batch_scores([lin], _bucket(lin.n), W=8, K=8)
    path = backtrack(lin, scores[0, : lin.n])
    cns = consensus_from_path(lin, path, min_weight=8, min_length=10)
    assert len(cns) == 1
    assert cns[0].seq == backbone
    assert cns[0].range == (0, 300)


def test_long_edge_overflow_raises():
    from pbdagcon_tpu.ops.dp import LongEdgeOverflow

    rng = random.Random(11)
    backbone, alns = simulate_pileup(rng, "w", 200, 20, NoiseProfile())
    g = _oracle_graph(backbone, alns)
    lin = linearize(g)
    if lin.span > 1:
        with pytest.raises(LongEdgeOverflow):
            pad_batch([lin], _bucket(lin.n), 1, 0)


def test_consensus_one_linear_matches_oracle():
    from pbdagcon_tpu.ops.linearize import consensus_one_from_path

    for seed in (70, 71, 72):
        rng = random.Random(seed)
        backbone, alns = simulate_pileup(rng, f"c{seed}", 120, 18, NoiseProfile())
        g = _oracle_graph(backbone, alns)
        lin = linearize(g)
        path = backtrack(lin, host_scores(lin))
        got = consensus_one_from_path(lin, path, min_weight=6)
        assert got == g.consensus_one(min_weight=6)
