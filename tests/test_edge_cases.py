"""SPEC corner cases: degenerate alignments, trim-to-empty, N bases,
lowercase, fragment boundaries, danglingNodes invariant."""

import io as _io

import pytest

from pbdagcon_tpu.alignment import (
    Alignment,
    normalize_gaps,
    parse_m5,
    trim_aln,
)
from pbdagcon_tpu.config import DagconConfig
from pbdagcon_tpu.io import FastaWriter
from pbdagcon_tpu.oracle.graph import AlnGraph
from pbdagcon_tpu.pipeline import run_stream
from pbdagcon_tpu.simulate import to_m5


def test_trim_to_empty_is_dropped():
    aln = Alignment(id="r", sid="t", tlen=10, start=1, qstr="ACG", tstr="ACG")
    out = trim_aln(aln, 2)
    assert out.qstr == "" or len(out.qstr) < 3  # nearly or fully consumed
    out = trim_aln(aln, 5)
    assert out.qstr == "" and out.tstr == ""


def test_normalize_idempotent():
    aln = Alignment(id="r", sid="t", tlen=20, start=1,
                    qstr="AC-GTAC", tstr="ACTG-AC")
    once = normalize_gaps(aln)
    twice = normalize_gaps(once)
    assert (once.qstr, once.tstr) == (twice.qstr, twice.tstr)


def test_n_bases_and_lowercase_roundtrip():
    aln = Alignment(id="r", sid="t", tlen=8, start=1,
                    qstr="aNcGT", tstr="aNcGT")
    g = AlnGraph("aNcGTxxx".replace("x", "A"))
    g.add_aln(normalize_gaps(aln))
    g.merge_nodes()
    assert g.dangling_nodes() == set()
    res = g.consensus(min_weight=1, min_length=1)
    assert res and res[0].seq.startswith("aNcGT")


def test_dangling_nodes_invariant_fuzz():
    import random

    from pbdagcon_tpu.simulate import NoiseProfile, simulate_pileup

    for seed in range(200, 212):
        rng = random.Random(seed)
        bb, alns = simulate_pileup(
            rng, "d", rng.randint(30, 150), rng.randint(2, 25),
            NoiseProfile(sub=0.05, ins=0.2, dele=0.1),
        )
        g = AlnGraph(bb)
        for a in alns:
            g.add_aln(normalize_gaps(a))
        g.merge_nodes()
        assert g.dangling_nodes() == set(), f"dangling nodes at seed {seed}"


def test_single_read_single_base():
    aln = Alignment(id="r", sid="t", tlen=1, start=1, qstr="A", tstr="A")
    g = AlnGraph("A")
    g.add_aln(normalize_gaps(aln))
    g.merge_nodes()
    res = g.consensus(min_weight=1, min_length=1)
    assert [(r.range, r.seq) for r in res] == [((0, 1), "A")]


def test_read_overrunning_backbone_rejected():
    aln = Alignment(id="r", sid="t", tlen=3, start=2,
                    qstr="ACG", tstr="ACG")
    g = AlnGraph("AAA")
    with pytest.raises(ValueError):
        g.add_aln(normalize_gaps(aln))


def test_empty_group_line_handling():
    # Blank lines between records must be ignored end to end.
    aln = Alignment(id="r", sid="t", tlen=6, start=1,
                    qstr="ACGTAC", tstr="ACGTAC")
    text = "\n" + to_m5(aln) + "\n\n" + to_m5(aln) + "\n\n"
    buf = _io.StringIO()
    run_stream(
        _io.StringIO(text), FastaWriter(buf),
        DagconConfig(min_weight=1, min_length=1, backend="host"),
    )
    assert buf.getvalue() == ">t/0_6\nACGTAC\n"


def test_min_weight_zero_keeps_everything():
    aln = Alignment(id="r", sid="t", tlen=4, start=1, qstr="ACGT", tstr="ACGT")
    g = AlnGraph("ACGT")
    g.add_aln(normalize_gaps(aln))
    g.merge_nodes()
    res = g.consensus(min_weight=0, min_length=1)
    assert res[0].seq == "ACGT"
