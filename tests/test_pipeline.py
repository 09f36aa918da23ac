"""End-to-end pipeline tests: M5 text in -> FASTA out, backends agree.

Models the reference's cram CLI tests (`test/cram/*.t`, SURVEY.md §4 —
reconstructed; mount empty): run the full pipeline on simulated
target-sorted M5 input and compare FASTA text across backends and
against the oracle engine.
"""

import io as _io
import random

import pytest

from pbdagcon_tpu.alignment import normalize_gaps
from pbdagcon_tpu.config import DagconConfig
from pbdagcon_tpu.io import FastaWriter, format_fasta, read_groups
from pbdagcon_tpu.oracle.graph import AlnGraph
from pbdagcon_tpu.pipeline import PipelineStats, run_pipeline, run_stream
from pbdagcon_tpu.simulate import (
    NoiseProfile,
    simulate_targets,
    to_m5,
    to_pre,
)


def _m5_text(seed, n_targets, length=200, cov=15, flip_frac=0.4):
    rng = random.Random(seed)
    lines = []
    for _tid, _bb, alns in simulate_targets(seed, n_targets, length, cov):
        for aln in alns:
            lines.append(to_m5(aln, flip=rng.random() < flip_frac))
    return "\n".join(lines) + "\n"


def _oracle_fasta(text, cfg):
    out = []
    for grp in read_groups(_io.StringIO(text), cfg.fmt):
        g = AlnGraph(grp.backbone)
        for a in grp.alns:
            g.add_aln(normalize_gaps(a))
        g.merge_nodes()
        res = g.consensus(cfg.min_weight, cfg.min_length)
        out.append(format_fasta(grp.sid, res))
    return "".join(out)


CFG = DagconConfig(min_weight=5, min_length=50, backend="xla", batch_targets=4)


def test_stream_matches_oracle_multi_target():
    text = _m5_text(seed=42, n_targets=7)
    expected = _oracle_fasta(text, CFG)
    buf = _io.StringIO()
    stats = run_stream(_io.StringIO(text), FastaWriter(buf), CFG)
    assert buf.getvalue() == expected
    assert stats.targets == 7
    assert stats.consensus_bases == sum(
        len(l) for l in expected.splitlines() if not l.startswith(">")
    )


def test_host_backend_matches_xla():
    text = _m5_text(seed=43, n_targets=5)
    out_host = _io.StringIO()
    out_xla = _io.StringIO()
    run_stream(
        _io.StringIO(text), FastaWriter(out_host),
        DagconConfig(min_weight=5, min_length=50, backend="host"),
    )
    run_stream(
        _io.StringIO(text), FastaWriter(out_xla),
        DagconConfig(min_weight=5, min_length=50, backend="xla", batch_targets=3),
    )
    assert out_host.getvalue() == out_xla.getvalue()


def test_pre_format_roundtrip():
    lines = []
    for _tid, _bb, alns in simulate_targets(7, 3, 150, 10):
        for aln in alns:
            lines.append(to_pre(aln))
    text = "\n".join(lines) + "\n"
    cfg = DagconConfig(min_weight=4, min_length=30, fmt="pre", backend="xla")
    expected = _oracle_fasta(text, cfg)
    buf = _io.StringIO()
    run_stream(_io.StringIO(text), FastaWriter(buf), cfg)
    assert buf.getvalue() == expected


def test_output_order_preserved():
    text = _m5_text(seed=44, n_targets=6, length=120, cov=10)
    buf = _io.StringIO()
    run_stream(
        _io.StringIO(text), FastaWriter(buf),
        DagconConfig(min_weight=3, min_length=20, backend="xla", batch_targets=2),
    )
    sids = [
        l[1:].split("/")[0]
        for l in buf.getvalue().splitlines()
        if l.startswith(">")
    ]
    # Target order must be input order (dedup consecutive fragments).
    seen = []
    for s in sids:
        if not seen or seen[-1] != s:
            seen.append(s)
    assert seen == sorted(seen, key=lambda s: int(s.replace("target", "")))


def test_min_length_filters_fragments():
    text = _m5_text(seed=45, n_targets=2, length=100, cov=12)
    big = _io.StringIO()
    run_stream(
        _io.StringIO(text), FastaWriter(big),
        DagconConfig(min_weight=4, min_length=10_000, backend="host"),
    )
    assert big.getvalue() == ""  # nothing passes a 10kb min length


def test_cli_smoke(tmp_path, capsys):
    from pbdagcon_tpu.cli import main

    m5 = tmp_path / "in.m5"
    m5.write_text(_m5_text(seed=46, n_targets=2, length=150, cov=12))
    rc = main([str(m5), "-c", "4", "-m", "30", "--backend", "xla"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith(">target0/")
    expected = _oracle_fasta(
        m5.read_text(), DagconConfig(min_weight=4, min_length=30)
    )
    assert out == expected


def test_high_depth_pileup_end_to_end():
    """BASELINE config #3 shape: deep noisy pileups stress merge, long
    edges, and bucket/layout selection; all backends must agree."""
    rng = random.Random(99)
    lines = []
    for _tid, _bb, alns in simulate_targets(
        99, 2, 150, 120,
        NoiseProfile(sub=0.04, ins=0.16, dele=0.08, max_ins_run=4),
    ):
        lines.extend(to_m5(a, flip=rng.random() < 0.3) for a in alns)
    text = "\n".join(lines) + "\n"
    outs = {}
    for backend in ("host", "xla", "blocked"):
        buf = _io.StringIO()
        run_stream(
            _io.StringIO(text), FastaWriter(buf),
            DagconConfig(min_weight=30, min_length=50, backend=backend),
        )
        outs[backend] = buf.getvalue()
    assert outs["host"] == outs["xla"] == outs["blocked"]
    assert outs["host"].count(">") >= 2
