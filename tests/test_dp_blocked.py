"""Blocked max-plus DP parity: bitwise equal to the sequential scan and
the host oracle on real pileups (including long-edge Kleene iteration)."""

import random

import numpy as np
import pytest

from pbdagcon_tpu.alignment import normalize_gaps
from pbdagcon_tpu.oracle.graph import AlnGraph
from pbdagcon_tpu.ops.dp import choose_layout, pad_batch
from pbdagcon_tpu.ops.dp_blocked import blocked_safe, dp_scores_blocked
from pbdagcon_tpu.ops.linearize import backtrack, host_scores, linearize
from pbdagcon_tpu.simulate import NoiseProfile, simulate_pileup


def _lins(seeds, length=150, cov=20, noise=None):
    out = []
    for seed in seeds:
        rng = random.Random(seed)
        backbone, alns = simulate_pileup(
            rng, f"blk{seed}", length, cov, noise or NoiseProfile()
        )
        g = AlnGraph(backbone)
        for a in alns:
            g.add_aln(normalize_gaps(a))
        g.merge_nodes()
        out.append(linearize(g, sid=f"blk{seed}"))
    return out


def _run_blocked(lins, V, L=64):
    W, K = choose_layout(lins)
    b = pad_batch(lins, V, W, K)
    s, unconv = dp_scores_blocked(
        b["win_count"], b["exit_count"], b["cov"], b["unsup"],
        b["long_u"], b["long_w"], b["long_esc"], L=L,
    )
    return np.asarray(s), np.asarray(unconv)


@pytest.mark.parametrize("seeds,length,cov,noise", [
    (range(4), 150, 20, None),
    (range(4, 6), 120, 60,
     NoiseProfile(sub=0.04, ins=0.18, dele=0.09, max_ins_run=4)),
])
def test_blocked_matches_host_bitwise(seeds, length, cov, noise):
    lins = _lins(seeds, length, cov, noise)
    V = 1024 if max(l.n for l in lins) <= 1024 else 2048
    assert all(
        blocked_safe(float(np.abs(l.cov).max(initial=1)), V) for l in lins
    )
    scores, unconv = _run_blocked(lins, V)
    for i, lin in enumerate(lins):
        hs = host_scores(lin)
        if unconv[i]:
            continue  # would fall back; must not happen below
        np.testing.assert_array_equal(scores[i, : lin.n], hs)
        assert backtrack(lin, scores[i, : lin.n]) == backtrack(lin, hs)
    assert not unconv.any(), "expected convergence on these pileups"


def test_blocked_long_edge_iteration_converges():
    """High-depth noisy pileups have long edges; iteration must still
    produce bitwise-exact scores for converged rows."""
    lins = _lins(
        [50, 51], length=100, cov=80,
        noise=NoiseProfile(sub=0.04, ins=0.18, dele=0.09, max_ins_run=4),
    )
    V = 2048
    scores, unconv = _run_blocked(lins, V)
    for i, lin in enumerate(lins):
        if not unconv[i]:
            np.testing.assert_array_equal(
                scores[i, : lin.n], host_scores(lin)
            )


def test_blocked_high_depth_bitwise():
    """The int32 reformulation's point: depths whose count/coverage
    magnitudes the old f32 bound rejected now run blocked and stay
    bitwise equal to the sequential scan / host oracle."""
    lins = _lins([70], length=60, cov=150)
    V = 2048
    assert all(
        blocked_safe(
            float(np.abs(l.cov).max(initial=1)) * 1.5 + 10.0, V
        )
        for l in lins
    )
    scores, unconv = _run_blocked(lins, V)
    assert not unconv.any()
    for i, lin in enumerate(lins):
        hs = host_scores(lin)
        np.testing.assert_array_equal(scores[i, : lin.n], hs)
        assert backtrack(lin, scores[i, : lin.n]) == backtrack(lin, hs)


def test_blocked_wide_band_large_v_bitwise():
    """Wide bands (W=64) + large V + L=128 blocks — the 100-500x-depth
    routing newly admitted by `_blocked_eligible` — stay bitwise equal
    to the host oracle."""
    from pbdagcon_tpu.ops.dp import pad_batch

    lins = _lins(
        [90], length=200, cov=100,
        noise=NoiseProfile(sub=0.04, ins=0.18, dele=0.09, max_ins_run=4),
    )
    V = 8192
    b = pad_batch(lins, V, W=64, K=64)
    s, unconv = dp_scores_blocked(
        b["win_count"], b["exit_count"], b["cov"], b["unsup"],
        b["long_u"], b["long_w"], b["long_esc"], L=128,
    )
    s, unconv = np.asarray(s), np.asarray(unconv)
    for i, lin in enumerate(lins):
        if not unconv[i]:
            hs = host_scores(lin)
            np.testing.assert_array_equal(s[i, : lin.n], hs)
            assert backtrack(lin, s[i, : lin.n]) == backtrack(lin, hs)
    assert not unconv.any(), "expected convergence"


def test_blocked_eligibility_routing():
    """_blocked_eligible: narrow bands only (wide bands measured 20x
    slower than the scan on-chip), deep narrow-band pileups admitted
    by the int32 bound."""
    from pbdagcon_tpu.ops.dp import _blocked_L, _blocked_eligible

    def fake_batch(B, V, W, count=10):
        return {
            "win_count": np.full((B, V, W), count, np.int16),
            "cov": np.full((B, V), count, np.int16),
        }

    assert _blocked_L(4608) == 64 and _blocked_L(14848) == 128
    assert _blocked_eligible(fake_batch(256, 4608, 16), 4608)
    assert not _blocked_eligible(fake_batch(256, 4608, 64), 4608)
    # Narrow band at large V / high counts: newly admitted by int32.
    assert _blocked_eligible(fake_batch(64, 14848, 32, count=400), 14848)
    assert not _blocked_eligible(fake_batch(64, 14848, 64), 14848)


def test_blocked_f32_parity_line_flags():
    """Scores past 2^24 - 2^17 half-units must flag the row (the f32
    spec scan could round there); synthetic long chain of huge counts."""
    import jax.numpy as jnp

    V, W = 128, 4
    win = np.full((1, V, W), -1, np.int32)
    # Chain u -> u+1 with enormous counts: path sum ~ V * 2c half-units.
    win[0, :-1, 0] = 70000  # beyond int16 wire, fine as int32 input
    exit_c = np.full((1, V), -1, np.int32)
    exit_c[0, -1] = 0
    cov = np.zeros((1, V), np.int32)
    uns = np.zeros((1, V), bool)
    lu = np.full((1, 1), -1, np.int32)
    s, flag = dp_scores_blocked(
        jnp.asarray(win), jnp.asarray(exit_c), jnp.asarray(cov),
        jnp.asarray(uns), jnp.asarray(lu), jnp.asarray(lu),
        jnp.full((1, 1), -np.inf, np.float32),
    )
    assert bool(np.asarray(flag)[0]), "expected f32-parity flag"


def test_blocked_safe_guard():
    # int32 half-unit bound: v * max(|esc|, 10) < 2^27. The 100-500x
    # depth regime (BASELINE config #3) passes at every bucket size.
    assert blocked_safe(30, 4608)
    assert blocked_safe(500, 8192)   # rejected under the old f32 bound
    assert blocked_safe(760, 16384)  # 500x-depth worst case
    assert not blocked_safe(20000, 8192)
    assert not blocked_safe(10000, 16384)
