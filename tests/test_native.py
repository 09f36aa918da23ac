"""Differential tests: native C++ engine == Python oracle, bit for bit.

The native engine reimplements SPEC.md §1–§3 in C++ (native/dagcon.cpp);
these tests fuzz it against the Python oracle/pipeline on simulated
pileups — parser, normalizer, graph+merge+linearize (via exported
arrays), float32 DP scores, and final FASTA."""

import io as _io
import random

import numpy as np
import pytest

from pbdagcon_tpu import native
from pbdagcon_tpu.alignment import normalize_gaps
from pbdagcon_tpu.config import DagconConfig
from pbdagcon_tpu.io import FastaWriter, format_fasta, read_groups
from pbdagcon_tpu.oracle.graph import AlnGraph
from pbdagcon_tpu.ops.linearize import host_scores, linearize
from pbdagcon_tpu.pipeline import run_stream
from pbdagcon_tpu.simulate import NoiseProfile, simulate_targets, to_m5, to_pre

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _m5_text(seed, n_targets, length=180, cov=15, flip_frac=0.4, noise=None):
    rng = random.Random(seed)
    lines = []
    for _tid, _bb, alns in simulate_targets(
        seed, n_targets, length, cov, noise or NoiseProfile()
    ):
        for aln in alns:
            lines.append(to_m5(aln, flip=rng.random() < flip_frac))
    return "\n".join(lines) + "\n"


def _oracle_fasta(text, fmt, min_weight, min_length, trim=0):
    from pbdagcon_tpu.alignment import trim_aln

    out = []
    for grp in read_groups(_io.StringIO(text), fmt):
        g = AlnGraph(grp.backbone)
        for a in grp.alns:
            if trim:
                a = trim_aln(a, trim)
            a = normalize_gaps(a)
            if not a.empty:
                g.add_aln(a)
        g.merge_nodes()
        res = g.consensus(min_weight, min_length)
        out.append(format_fasta(grp.sid, res))
    return "".join(out)


@pytest.mark.parametrize("seed,cov,noise", [
    (10, 10, NoiseProfile()),
    (11, 30, NoiseProfile()),
    (12, 50, NoiseProfile(sub=0.04, ins=0.18, dele=0.09, max_ins_run=4)),
])
def test_native_consensus_matches_oracle(seed, cov, noise):
    text = _m5_text(seed, n_targets=4, cov=cov, noise=noise)
    expected = _oracle_fasta(text, "m5", 5, 20)
    with native.NativeEngine(min_weight=5, min_length=20, threads=4) as eng:
        got = eng.consensus_text(text.encode())
    assert got == expected


def test_native_pre_format():
    lines = []
    for _tid, _bb, alns in simulate_targets(13, 3, 150, 12):
        lines.extend(to_pre(a) for a in alns)
    text = "\n".join(lines) + "\n"
    expected = _oracle_fasta(text, "pre", 4, 20)
    with native.NativeEngine(min_weight=4, min_length=20) as eng:
        assert eng.consensus_text(text.encode(), fmt="pre") == expected


def test_native_trim():
    text = _m5_text(14, n_targets=3, cov=20)
    expected = _oracle_fasta(text, "m5", 5, 20, trim=3)
    with native.NativeEngine(min_weight=5, min_length=20, trim=3) as eng:
        assert eng.consensus_text(text.encode()) == expected


def test_native_chunked_streaming():
    """Feeding byte-chunks (split mid-line, mid-group) must equal one-shot."""
    text = _m5_text(15, n_targets=5, cov=10)
    expected = _oracle_fasta(text, "m5", 4, 20)
    data = text.encode()
    out = []
    with native.NativeEngine(min_weight=4, min_length=20) as eng:
        step = 997  # prime: splits lines and groups arbitrarily
        for i in range(0, len(data), step):
            out.append(eng.consensus_text(data[i : i + step], flush=False))
        out.append(eng.consensus_text(b"", flush=True))
    assert "".join(out) == expected


def test_native_linearize_matches_python():
    text = _m5_text(16, n_targets=3, cov=25)
    groups = list(read_groups(_io.StringIO(text)))
    with native.NativeEngine(min_weight=8, min_length=50) as eng:
        count = eng.linearize_text(text.encode())
        assert count == len(groups)
        for i, grp in enumerate(groups):
            g = AlnGraph(grp.backbone)
            for a in grp.alns:
                g.add_aln(normalize_gaps(a))
            g.merge_nodes()
            pl = linearize(g, sid=grp.sid)
            nl = eng.get_linear(i)
            assert nl.sid == pl.sid
            assert nl.n == pl.n
            assert nl.span == pl.span
            np.testing.assert_array_equal(nl.base, pl.base)
            np.testing.assert_array_equal(nl.weight, pl.weight)
            np.testing.assert_array_equal(nl.bb, pl.bb)
            np.testing.assert_array_equal(nl.cov, pl.cov)
            np.testing.assert_array_equal(nl.unsup, pl.unsup)
            np.testing.assert_array_equal(nl.exit_count, pl.exit_count)
            np.testing.assert_array_equal(nl.edge_off, pl.edge_off)
            np.testing.assert_array_equal(nl.edge_tgt, pl.edge_tgt)
            np.testing.assert_array_equal(nl.edge_cnt, pl.edge_cnt)
            np.testing.assert_array_equal(nl.enter_tgt, pl.enter_tgt)
            np.testing.assert_array_equal(nl.enter_cnt, pl.enter_cnt)
            # Native float32 DP == Python float32 DP, bitwise.
            ns = eng.target_scores(i, nl.n)
            np.testing.assert_array_equal(ns[: nl.n], host_scores(pl))
            # Native backtrack+emit == oracle FASTA.
            res = g.consensus(8, 50)
            assert eng.target_consensus(i, ns) == format_fasta(grp.sid, res)


def test_native_against_full_pipeline():
    """Native host mode == Python xla-backend pipeline output."""
    text = _m5_text(17, n_targets=4, cov=12)
    buf = _io.StringIO()
    run_stream(
        _io.StringIO(text), FastaWriter(buf),
        DagconConfig(min_weight=5, min_length=30, backend="xla"),
    )
    with native.NativeEngine(min_weight=5, min_length=30) as eng:
        assert eng.consensus_text(text.encode()) == buf.getvalue()


def test_native_pack_batch_matches_python():
    from pbdagcon_tpu.ops.dp import pad_batch

    text = _m5_text(18, n_targets=6, cov=20)
    with native.NativeEngine(min_weight=8, min_length=50) as eng:
        count = eng.linearize_text(text.encode())
        lins = [eng.get_linear(i) for i in range(count)]
        V = 4096
        W, K = 16, 64
        py = pad_batch(lins, V, W, K)
        nat = eng.pack_batch(list(range(count)), V, W, K)
        for key in py:
            if key == "n":
                continue
            np.testing.assert_array_equal(nat[key], py[key], err_msg=key)
        # long_counts agrees with python span counting
        for i, lin in enumerate(lins):
            u = np.repeat(np.arange(lin.n, dtype=np.int32),
                          np.diff(lin.edge_off))
            m = lin.edge_tgt < lin.n
            spans = (lin.edge_tgt - u)[m]
            got = eng.long_counts(i, (8, 16, 32))
            want = [(spans > W_).sum() for W_ in (8, 16, 32)]
            np.testing.assert_array_equal(got, want)


def test_native_pack_edges_roundtrip():
    """Edge-CSR arena -> device scatter reconstruction == dense pack."""
    import jax

    from pbdagcon_tpu.ops.dp import (
        _edges_to_scores, dp_scores, pad_batch,
    )
    import jax.numpy as jnp

    text = _m5_text(19, n_targets=5, cov=18)
    with native.NativeEngine(min_weight=8, min_length=50) as eng:
        count = eng.linearize_text(text.encode())
        lins = [eng.get_linear(i) for i in range(count)]
        V, W, K = 2048, 16, 32
        dense = pad_batch(lins, V, W, K)
        s_ref = np.asarray(
            dp_scores(
                jnp.asarray(dense["win_count"]),
                jnp.asarray(dense["exit_count"]),
                jnp.asarray(dense["cov"]),
                jnp.asarray(dense["unsup"]),
                jnp.asarray(dense["long_u"]),
                jnp.asarray(dense["long_w"]),
                jnp.asarray(dense["long_esc"]),
            )
        )
        eb = eng.pack_edges(
            list(range(count)), V, W, K, b_pad=count, e_pad=1 << 14,
            x_pad=1 << 12,
        )
        Bp, V2, W2, K2, E, X = eb["_dims"]
        s_edges = np.asarray(
            _edges_to_scores(
                jnp.asarray(eb["_edges_arena"]), B=Bp, V=V2, W=W2, K=K2,
                E=E, X=X,
            )
        )
        np.testing.assert_array_equal(s_edges[:count], s_ref)
