"""Column-sharded (sequence-parallel) DP parity on the 8-device mesh."""

import random

import numpy as np

from pbdagcon_tpu.alignment import normalize_gaps
from pbdagcon_tpu.oracle.graph import AlnGraph
from pbdagcon_tpu.ops.linearize import host_scores, linearize
from pbdagcon_tpu.parallel.colshard import colsharded_scores
from pbdagcon_tpu.parallel.mesh import make_mesh
from pbdagcon_tpu.simulate import NoiseProfile, simulate_pileup


def _one_target_arrays(seed, length, cov, W):
    rng = random.Random(seed)
    backbone, alns = simulate_pileup(
        rng, f"cs{seed}", length, cov, NoiseProfile()
    )
    g = AlnGraph(backbone)
    for a in alns:
        g.add_aln(normalize_gaps(a))
    g.merge_nodes()
    lin = linearize(g)
    if lin.span > W:
        return None, None  # not eligible; caller skips
    u = np.repeat(np.arange(lin.n, dtype=np.int32), np.diff(lin.edge_off))
    interior = lin.edge_tgt < lin.n
    win = np.full((lin.n, W), -1, dtype=np.int32)
    d = (lin.edge_tgt - u - 1)[interior]
    win[u[interior], d] = lin.edge_cnt[interior]
    return lin, {
        "win": win,
        "exit": lin.exit_count,
        "cov": lin.cov,
        "unsup": lin.unsup,
    }


def test_colsharded_matches_host():
    mesh = make_mesh()
    W = 64
    done = 0
    for seed in range(30, 40):
        lin, arrs = _one_target_arrays(seed, 400, 20, W)
        if lin is None:
            continue
        s = colsharded_scores(
            arrs["win"], arrs["exit"], arrs["cov"], arrs["unsup"], mesh
        )
        np.testing.assert_array_equal(s, host_scores(lin))
        done += 1
        if done >= 3:
            break
    assert done >= 1, "no eligible (span <= W) targets generated"


def test_oversize_backbone_routes_to_colshard():
    """A target overflowing every V bucket goes through the column-
    sharded DP (not the host fallback) and stays byte-identical."""
    import io as _io
    import random

    import pytest

    from pbdagcon_tpu import native
    from pbdagcon_tpu.config import DagconConfig
    from pbdagcon_tpu.io import FastaWriter
    from pbdagcon_tpu.pipeline import run_stream
    from pbdagcon_tpu.simulate import simulate_targets, to_m5

    if not native.available():
        pytest.skip("native library not built")
    lines = []
    for tid, _bb, alns in simulate_targets(21, 2, 500, 12):
        for a in alns:
            lines.append(to_m5(a))
    text = "\n".join(lines) + "\n"
    buf_h = _io.StringIO()
    run_stream(
        _io.StringIO(text), FastaWriter(buf_h),
        DagconConfig(backend="host", use_native=True, min_weight=3,
                     min_length=50),
    )
    buf_c = _io.StringIO()
    stats = run_stream(
        _io.StringIO(text), FastaWriter(buf_c),
        DagconConfig(backend="xla", use_native=True, min_weight=3,
                     min_length=50, v_buckets=(256,)),
    )
    assert buf_c.getvalue() == buf_h.getvalue()
    # One fixture target carries a long edge (span > max W) and is
    # ineligible by design; the other must go through colshard.
    assert stats.batches >= 1, "colshard path not taken"
    assert stats.host_fallbacks <= 1
