"""Bitwise tests: JAX device build vs the NumPy oracle (devbuild.py)."""

import random

import jax

import numpy as np
import pytest

from pbdagcon_tpu.ops import devbuild as dbn
from pbdagcon_tpu.ops import devbuild_jax as dbj
from pbdagcon_tpu.simulate import NoiseProfile, simulate_pileup


def batch_encode(encs, caps):
    """Pack EncodedGroups into the batched device input arrays."""
    B = caps.B
    ops = np.zeros((B, caps.R, caps.C), dtype=np.uint8)
    starts = np.zeros((B, caps.R), dtype=np.int32)
    bb = np.zeros((B, caps.L), dtype=np.uint8)
    Lr = np.zeros(B, dtype=np.int32)
    NI = caps.R * caps.C
    ins = np.zeros((B, NI), dtype=np.uint8)
    for b, e in enumerate(encs):
        R, C = e.ops.shape
        assert R <= caps.R and C <= caps.C and len(e.backbone) <= caps.L
        ops[b, :R, :C] = e.ops
        starts[b, :R] = e.starts
        bb[b, : len(e.backbone)] = e.backbone
        Lr[b] = len(e.backbone)
        ins[b, : len(e.ins_base)] = e.ins_base
    return ops, starts, bb, ins, Lr


def _mk(seed, L=40, depth=6, noise=None):
    rng = random.Random(seed)
    bbs, alns = simulate_pileup(
        rng, "t", L, depth, noise or NoiseProfile(sub=0.05, ins=0.2, dele=0.1)
    )
    return dbn.encode_group(bbs, alns, sid="t")


CAPS = dbj.Caps(
    B=2, R=12, C=96, L=48, CH=32, SM=8, NC=192, ND=256, SE=8, DQ=8,
    V=256, W=16,
)


def test_decode_cov_matches():
    encs = [_mk(1), _mk(2, L=30, depth=4)]
    ops, starts, bb, ins, Lr = batch_encode(encs, CAPS)
    dec = dbj.decode_columns(ops, starts, CAPS)
    cov, matches = dbj.coverage_and_matches(ops, starts, dec, CAPS)
    for b, e in enumerate(encs):
        covn, matn, _tr, _ch = dbn._walk_reads(e)
        Ln = len(e.backbone)
        np.testing.assert_array_equal(
            np.asarray(cov)[b, : Ln + 2], covn.astype(np.int32)
        )
        np.testing.assert_array_equal(
            np.asarray(matches)[b, : Ln + 2], matn.astype(np.int32)
        )


def test_chain_extraction_matches_oracle():
    encs = [_mk(11), _mk(12, L=44, depth=8)]
    ops, starts, bb, ins, Lr = batch_encode(encs, CAPS)
    dec = dbj.decode_columns(ops, starts, CAPS)
    cov, matches = dbj.coverage_and_matches(ops, starts, dec, CAPS)
    mpos, _mch, _s0 = dbj.matched_positions(ops, dec, starts, Lr, CAPS)
    chains = dbj.extract_chains(ops, starts, ins, dec, mpos, Lr, CAPS)
    for b, e in enumerate(encs):
        _c, _m, _tr, chn = dbn._walk_reads(e)
        got = []
        val = np.asarray(chains["valid"])[b]
        for r in range(CAPS.R):
            for c in range(CAPS.CH):
                if not val[r, c]:
                    continue
                m = int(np.asarray(chains["len"])[b, r, c])
                ba = np.asarray(chains["rev_ba"])[b, :m, r, c]
                rb = ba & 0xFF
                ra = ba >> 8
                got.append((
                    int(np.asarray(chains["p"])[b, r, c]),
                    int(np.asarray(chains["t"])[b, r, c]),
                    tuple(int(x) for x in rb[::-1]),
                    tuple(int(x) for x in ra[::-1]),
                    r,
                ))
        want = [(ch.p, ch.t, ch.bases, ch.anchors, ch.r) for ch in chn]
        assert sorted(got) == sorted(want), f"target {b}"
        assert not bool(np.asarray(chains["overflow_any"])[b])


def _np_edges(lin, keys):
    """Reference edge set {(u, tgt, cnt, key)} from the NumPy
    LinearGraph + keys (tgt == n encodes the exit edge)."""
    out = set()
    n = lin.n
    for u in range(n):
        for e in range(lin.edge_off[u], lin.edge_off[u + 1]):
            out.add((
                u, int(lin.edge_tgt[e]), int(lin.edge_cnt[e]),
                int(keys.edge_key[e]),
            ))
    return out


def _dev_edges(out, b, n, V, W):
    """Device edge set: band + exit lanes + K long registers."""
    edges = set()
    win = out["win"][b]
    wkey = out["wkey"][b]
    for u, d in np.argwhere(win >= 0):
        edges.add((int(u), int(u) + 1 + int(d), int(win[u, d]),
                   int(wkey[u, d])))
    xc = out["exit_cnt"][b]
    xk = out["exit_key"][b]
    for (u,) in np.argwhere(xc >= 0):
        edges.add((int(u), n, int(xc[u]), int(xk[u])))
    for k in range(out["long_u"].shape[1]):
        if out["long_u"][b, k] >= 0:
            edges.add((
                int(out["long_u"][b, k]), int(out["long_w"][b, k]),
                int(out["long_cnt"][b, k]), int(out["long_key"][b, k]),
            ))
    return edges


@pytest.mark.parametrize("caps", [
    dbj.Caps(
        B=4, R=12, C=120, L=56, CH=32, SM=8, NC=384, ND=256, SE=8,
        DQ=8, V=320, W=64,
    ),
    # Wide rungs: NC*SM >= 2^16 and R >= 2^10 force linearize's
    # unpacked payload branches (large-caps production shapes).
    dbj.Caps(
        B=4, R=1024, C=120, L=56, CH=32, SM=8, NC=8192, ND=256, SE=8,
        DQ=8, V=320, W=64,
    ),
])
def test_device_build_bitwise_vs_oracle(caps):
    encs = [
        _mk(101, L=50, depth=8),
        _mk(102, L=56, depth=10),
        _mk(103, L=20, depth=3),
        _mk(104, L=40, depth=6,
            noise=NoiseProfile(sub=0.02, ins=0.3, dele=0.15)),
    ]
    ops, starts, bb, ins, Lr = batch_encode(encs, caps)
    out = jax.tree_util.tree_map(
        np.asarray,
        dbj.device_build(ops, starts, bb, ins, Lr, caps),
    )
    checked = 0
    for b, e in enumerate(encs):
        lin, flags, keys = dbn.build_linear(e)
        if lin is None:
            assert bool(out["flags"][b]) or True  # oracle flagged
            continue
        if bool(out["flags"][b]):
            continue  # device cap overflow: allowed, falls back
        checked += 1
        n = lin.n
        assert int(out["n"][b]) == n, f"target {b}: n mismatch"
        np.testing.assert_array_equal(
            out["base"][b, :n], lin.base, err_msg=f"t{b} base"
        )
        np.testing.assert_array_equal(
            out["weight"][b, :n], lin.weight, err_msg=f"t{b} weight"
        )
        np.testing.assert_array_equal(
            out["bbpos"][b, :n], lin.bb, err_msg=f"t{b} bb"
        )
        np.testing.assert_array_equal(
            out["cov"][b, :n], lin.cov, err_msg=f"t{b} cov"
        )
        np.testing.assert_array_equal(
            out["unsup"][b, :n], lin.unsup, err_msg=f"t{b} unsup"
        )
        dev = _dev_edges(out, b, n, caps.V, caps.W)
        ref = _np_edges(lin, keys)
        assert dev == ref, f"t{b} edges: {sorted(dev ^ ref)[:6]}"
        # enter candidates as sets of (tgt, cnt, key)
        dev = set()
        ent = out["enter"]
        for j in range(ent["tgt"].shape[1]):
            if ent["present"][b, j]:
                dev.add((
                    int(ent["tgt"][b, j]), int(ent["cnt"][b, j]),
                    int(ent["key"][b, j]),
                ))
        ref = set(
            zip(
                (int(x) for x in lin.enter_tgt),
                (int(x) for x in lin.enter_cnt),
                (int(x) for x in keys.enter_key),
            )
        )
        assert dev == ref, f"t{b} enter: {dev ^ ref}"
    assert checked >= 2


def test_device_build_soak_bitwise():
    caps = dbj.Caps(
        B=8, R=24, C=200, L=96, CH=48, SM=8, NC=1152, ND=512, SE=8,
        DQ=8, V=640, W=64,
    )
    rngmk = [
        (s, 40 + (s * 7) % 56, 2 + (s * 5) % 22)
        for s in range(200, 224)
    ]
    profs = [
        NoiseProfile(),
        NoiseProfile(sub=0.05, ins=0.2, dele=0.1),
        NoiseProfile(sub=0.02, ins=0.25, dele=0.12, max_ins_run=5),
    ]
    encs_all = [
        _mk(s, L=L, depth=d, noise=profs[s % 3]) for s, L, d in rngmk
    ]
    checked = 0
    for lo in range(0, len(encs_all), caps.B):
        encs = encs_all[lo : lo + caps.B]
        while len(encs) < caps.B:
            encs.append(encs_all[0])
        ops, starts, bb, ins, Lr = batch_encode(encs, caps)
        out = jax.tree_util.tree_map(
            np.asarray, dbj.device_build(ops, starts, bb, ins, Lr, caps)
        )
        for b, e in enumerate(encs):
            lin, flags, keys = dbn.build_linear(e)
            if lin is None or bool(out["flags"][b]):
                continue
            checked += 1
            n = lin.n
            assert int(out["n"][b]) == n
            np.testing.assert_array_equal(out["base"][b, :n], lin.base)
            np.testing.assert_array_equal(out["weight"][b, :n], lin.weight)
            np.testing.assert_array_equal(out["cov"][b, :n], lin.cov)
            np.testing.assert_array_equal(out["unsup"][b, :n], lin.unsup)
            dev = _dev_edges(out, b, n, caps.V, caps.W)
            ref = _np_edges(lin, keys)
            assert dev == ref, f"t{lo+b} edges: {sorted(dev ^ ref)[:6]}"
    assert checked >= 12, f"only {checked} unflagged targets"


def test_device_consensus_end_to_end():
    """device_build -> dp_scores -> backtrack_emit == host engine."""
    import jax.numpy as jnp

    from pbdagcon_tpu.ops import devemit
    from pbdagcon_tpu.ops.dp import dp_scores
    from pbdagcon_tpu.ops.linearize import (
        backtrack, consensus_from_path, graph_from_group, host_scores,
        linearize,
    )
    from pbdagcon_tpu.alignment import normalize_gaps

    caps = dbj.Caps(
        B=8, R=24, C=220, L=96, CH=48, SM=8, NC=1152, ND=512, SE=8,
        DQ=8, V=640, W=64,
    )
    P = 320
    profs = [
        NoiseProfile(),
        NoiseProfile(sub=0.05, ins=0.2, dele=0.1),
        NoiseProfile(sub=0.02, ins=0.25, dele=0.12, max_ins_run=5),
    ]
    rng = random.Random(4242)
    pile = []
    for s in range(16):
        L = rng.randint(30, 90)
        d = rng.randint(2, 20)
        bbs, alns = simulate_pileup(rng, f"t{s}", L, d, profs[s % 3])
        pile.append((bbs, alns))
    checked = 0
    for lo in range(0, len(pile), caps.B):
        group = pile[lo : lo + caps.B]
        while len(group) < caps.B:
            group.append(pile[0])
        encs = [
            dbn.encode_group(bbs, alns, sid=f"g{i}")
            for i, (bbs, alns) in enumerate(group)
        ]
        ops, starts, bb, ins, Lr = batch_encode(encs, caps)
        build = dbj.device_build(ops, starts, bb, ins, Lr, caps)
        scores = dp_scores(
            build["win"], build["exit_cnt"], build["cov"], build["unsup"],
            build["long_u"], build["long_w"], build["long_esc"],
        )
        mw = 2
        emit = jax.tree_util.tree_map(
            np.asarray,
            devemit.backtrack_emit(build, scores, jnp.int32(mw), P),
        )
        flags = np.asarray(build["flags"])
        for b, (bbs, alns) in enumerate(group):
            if flags[b] or emit["ambiguous"][b] or emit["overflow"][b]:
                continue
            checked += 1
            got = devemit.assemble_fragments(
                emit["bases"][b], emit["kept"][b], emit["bbpos"][b],
                int(emit["path_len"][b]), 5,
            )
            g = graph_from_group(bbs, alns)
            hl = linearize(g, sid="x")
            want = consensus_from_path(
                hl, backtrack(hl, host_scores(hl)), mw, 5
            )
            assert [(r.range, r.seq) for r in got] == [
                (r.range, r.seq) for r in want
            ], f"pile {lo + b}"
    assert checked >= 10, f"only {checked} checked"
