"""Differential tests: order-free device-build oracle vs the exact graph
engine. For unflagged targets the consensus must be bit-identical; the
flag rate must stay low enough for the fast path to matter."""

import random

import numpy as np
import pytest

from pbdagcon_tpu.alignment import Alignment, normalize_gaps
from pbdagcon_tpu.config import DagconConfig
from pbdagcon_tpu.ops.devbuild import (
    backtrack_keys,
    build_linear,
    encode_group,
)
from pbdagcon_tpu.ops.linearize import (
    consensus_from_path,
    graph_from_group,
    host_scores,
    linearize,
)
from pbdagcon_tpu.simulate import NoiseProfile, simulate_pileup


def _consensus_via_devbuild(backbone, alns, min_weight, min_length):
    """(results | None if flagged, flags)"""
    enc = encode_group(backbone, alns, sid="t")
    lin, flags, keys = build_linear(enc)
    if lin is None:
        return None, flags
    scores = host_scores(lin)
    path, ambiguous = backtrack_keys(lin, keys, scores)
    if ambiguous:
        return None, 8  # FLAG_TIE
    return consensus_from_path(lin, path, min_weight, min_length), 0


def _consensus_via_host(backbone, alns, min_weight, min_length):
    g = graph_from_group(backbone, alns)
    lin = linearize(g, sid="t")
    from pbdagcon_tpu.ops.linearize import backtrack

    path = backtrack(lin, host_scores(lin))
    return consensus_from_path(lin, path, min_weight, min_length)


@pytest.mark.parametrize("noise,depth_rng,len_rng,trials", [
    (NoiseProfile(), (5, 40), (200, 1200), 40),
    (NoiseProfile(sub=0.05, ins=0.2, dele=0.1), (2, 25), (50, 300), 40),
    (NoiseProfile(sub=0.02, ins=0.12, dele=0.06), (60, 120), (100, 250), 8),
])
def test_devbuild_matches_host_on_soak(noise, depth_rng, len_rng, trials):
    flagged = 0
    checked = 0
    for seed in range(trials):
        rng = random.Random(10_000 + seed)
        bb, alns = simulate_pileup(
            rng, "t", rng.randint(*len_rng), rng.randint(*depth_rng), noise
        )
        mw = rng.choice([1, 2, 4, 8])
        ml = rng.choice([1, 25, 100])
        got, flags = _consensus_via_devbuild(bb, alns, mw, ml)
        if got is None:
            flagged += 1
            continue
        checked += 1
        want = _consensus_via_host(bb, alns, mw, ml)
        assert [(r.range, r.seq) for r in got] == [
            (r.range, r.seq) for r in want
        ], f"seed {seed} (mw={mw} ml={ml})"
    # The fast path must dominate: flags (absorption cascades) are rare.
    assert checked > 0
    assert flagged <= max(1, trials * 0.1), f"{flagged}/{trials} flagged"


def test_devbuild_simple_exact():
    bb = "ACGTACGTAC"
    alns = [
        Alignment(id=f"r{i}", sid="t", tlen=10, start=1,
                  qstr="ACGTACGTAC", tstr="ACGTACGTAC").recompute_end()
        for i in range(3)
    ]
    got, flags = _consensus_via_devbuild(bb, alns, 1, 1)
    assert flags == 0
    assert [(r.range, r.seq) for r in got] == [((0, 10), "ACGTACGTAC")]


def test_devbuild_insertion_merging():
    # Two reads insert the same base between positions 2 and 3: the trie
    # merges them and the consensus keeps the insertion at weight 2.
    bb = "AACC"
    alns = [
        Alignment(id="r0", sid="t", tlen=4, start=1,
                  qstr="AAGCC", tstr="AA-CC"),
        Alignment(id="r1", sid="t", tlen=4, start=1,
                  qstr="AAGCC", tstr="AA-CC"),
        Alignment(id="r2", sid="t", tlen=4, start=1,
                  qstr="AACC", tstr="AACC"),
    ]
    alns = [a.recompute_end() for a in alns]
    got, flags = _consensus_via_devbuild(bb, alns, 2, 1)
    assert flags == 0
    want = _consensus_via_host(bb, alns, 2, 1)
    assert [(r.range, r.seq) for r in got] == [
        (r.range, r.seq) for r in want
    ]
    assert got[0].seq == "AAGCC"


def test_devbuild_multi_fragment_and_trim():
    rng = random.Random(77)
    bb, alns = simulate_pileup(rng, "t", 600, 12, NoiseProfile())
    # Kill coverage in the middle to force fragment splitting.
    alns = [a for a in alns if not (200 < (a.start + a.end) / 2 < 400)
            or (a.end - a.start) > 500]
    enc = encode_group(bb, alns, trim=3, sid="t")
    lin, flags, keys = build_linear(enc)
    if lin is None:
        pytest.skip("flagged configuration")
    path, ambiguous = backtrack_keys(lin, keys, host_scores(lin))
    assert not ambiguous
    got = consensus_from_path(lin, path, 4, 50)
    g = graph_from_group(bb, alns, trim=3)
    hl = linearize(g, sid="t")
    from pbdagcon_tpu.ops.linearize import backtrack

    want = consensus_from_path(hl, backtrack(hl, host_scores(hl)), 4, 50)
    assert [(r.range, r.seq) for r in got] == [
        (r.range, r.seq) for r in want
    ]
