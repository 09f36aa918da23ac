"""Aligner tests: Python vs C++ exact agreement, `-a` path end-to-end."""

import io as _io
import random

import pytest

from pbdagcon_tpu import native
from pbdagcon_tpu.aligner import align_pair, align_record
from pbdagcon_tpu.alignment import Alignment, parse_pre
from pbdagcon_tpu.config import DagconConfig
from pbdagcon_tpu.io import FastaWriter
from pbdagcon_tpu.pipeline import run_stream
from pbdagcon_tpu.simulate import (
    NoiseProfile,
    simulate_pileup,
    simulate_targets,
    to_pre_raw,
)


def test_align_identical():
    q, t = align_pair("ACGTACGT", "ACGTACGT")
    assert q == t == "ACGTACGT"


def test_align_simple_indel():
    q, t = align_pair("ACGTT", "ACGT")
    assert q.replace("-", "") == "ACGTT"
    assert t.replace("-", "") == "ACGT"
    assert len(q) == len(t) == 5
    assert sum(1 for c in t if c == "-") == 1


def test_align_empty_sides():
    assert align_pair("", "ACG") == ("---", "ACG")
    assert align_pair("ACG", "") == ("ACG", "---")


@pytest.mark.skipif(not native.available(), reason="native not built")
def test_native_aligner_matches_python():
    rng = random.Random(5)
    for trial in range(25):
        bb, alns = simulate_pileup(
            rng, "t", rng.randint(20, 300), 1,
            NoiseProfile(sub=0.05, ins=0.12, dele=0.08),
            full_span_first=False,
        )
        if not alns:
            continue
        q = alns[0].qstr.replace("-", "")
        t = alns[0].tstr.replace("-", "")
        assert native.align_pair_native(q, t) == align_pair(q, t)


def test_align_record_recovers_equal_lengths():
    aln = Alignment(id="r", sid="t", tlen=10, start=1,
                    qstr="ACGGT", tstr="ACGT")
    out = align_record(aln)
    assert len(out.qstr) == len(out.tstr)
    assert out.end == out.start - 1 + 4


def test_pre_raw_roundtrip_and_pipeline():
    """Raw 'pre' records + -a give a sane consensus (host/device agree)."""
    lines = []
    for _tid, _bb, alns in simulate_targets(21, 3, 200, 15):
        lines.extend(to_pre_raw(a) for a in alns)
    text = "\n".join(lines) + "\n"
    aln = parse_pre(lines[0].rstrip())
    assert "-" not in aln.qstr and "-" not in aln.tstr

    cfg_host = DagconConfig(
        min_weight=5, min_length=30, fmt="pre", align=True, backend="host"
    )
    cfg_dev = DagconConfig(
        min_weight=5, min_length=30, fmt="pre", align=True, backend="xla",
        align_backend="device",
    )
    out_h, out_d = _io.StringIO(), _io.StringIO()
    run_stream(_io.StringIO(text), FastaWriter(out_h), cfg_host)
    run_stream(_io.StringIO(text), FastaWriter(out_d), cfg_dev)
    assert out_h.getvalue() == out_d.getvalue()
    assert out_h.getvalue().startswith(">target0/")


@pytest.mark.skipif(not native.available(), reason="native not built")
def test_pre_raw_native_vs_python_pipeline():
    """-a consensus: native engine == pure-Python path, byte for byte."""
    lines = []
    for _tid, _bb, alns in simulate_targets(22, 2, 150, 10):
        lines.extend(to_pre_raw(a) for a in alns)
    text = "\n".join(lines) + "\n"
    cfg_py = DagconConfig(
        min_weight=4, min_length=20, fmt="pre", align=True,
        backend="host", use_native=False,
    )
    out_py = _io.StringIO()
    run_stream(_io.StringIO(text), FastaWriter(out_py), cfg_py)
    with native.NativeEngine(
        min_weight=4, min_length=20, align=True
    ) as eng:
        got = eng.consensus_text(text.encode(), fmt="pre")
    assert got == out_py.getvalue()
