"""Simulator + IO unit tests: M5/'pre' round-trips, grouping, FASTA."""

import io as _io
import random

from pbdagcon_tpu.alignment import parse_m5, parse_pre
from pbdagcon_tpu.io import format_fasta, read_groups
from pbdagcon_tpu.oracle.graph import CnsResult
from pbdagcon_tpu.simulate import (
    NoiseProfile,
    simulate_pileup,
    simulate_targets,
    to_m5,
    to_pre,
)


def test_m5_roundtrip_forward_and_flipped():
    rng = random.Random(1)
    _bb, alns = simulate_pileup(rng, "t", 120, 8, NoiseProfile())
    for aln in alns:
        for flip in (False, True):
            back = parse_m5(to_m5(aln, flip=flip))
            assert back.id == aln.id
            assert back.sid == aln.sid
            assert back.tlen == aln.tlen
            assert back.start == aln.start
            assert back.end == aln.end
            assert back.qstr == aln.qstr
            assert back.tstr == aln.tstr


def test_pre_roundtrip():
    rng = random.Random(2)
    _bb, alns = simulate_pileup(rng, "t", 90, 5, NoiseProfile())
    for aln in alns:
        back = parse_pre(to_pre(aln))
        assert back == aln


def test_simulated_tstr_matches_backbone():
    rng = random.Random(3)
    bb, alns = simulate_pileup(rng, "t", 200, 10, NoiseProfile())
    for aln in alns:
        ungapped = aln.tstr.replace("-", "")
        assert ungapped == bb[aln.start - 1 : aln.end]


def test_read_groups_recovers_backbone():
    text = []
    bbs = {}
    for tid, bb, alns in simulate_targets(4, 3, 150, 10):
        bbs[tid] = bb
        text.extend(to_m5(a) for a in alns)
    groups = list(read_groups(_io.StringIO("\n".join(text))))
    assert [g.sid for g in groups] == ["target0", "target1", "target2"]
    for g in groups:
        assert g.backbone == bbs[g.sid]


def test_format_fasta_header_and_wrap():
    res = [CnsResult((10, 20), "ACGTACGTAC")]
    assert format_fasta("tgt", res) == ">tgt/10_20\nACGTACGTAC\n"
    wrapped = format_fasta("tgt", res, width=4)
    assert wrapped == ">tgt/10_20\nACGT\nACGT\nAC\n"
