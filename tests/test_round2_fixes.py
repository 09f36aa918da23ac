"""Round-2 regression tests for the round-1 advisor findings (ADVICE.md):

1. int8 arena squeeze must guard on edge counts, not just coverage
   (merged boundary insertion nodes accumulate votes from every read).
2. run_pipeline.flush() must key batch results by position, not sid
   (repeated non-consecutive target ids are distinct groups).
3. The enter->exit edge (created by all-deletion records) must be scored
   by the production backtrack exactly as the oracle scores it.
4. Malformed input must raise in loader mode, same as host mode; raw
   pairs without -a are skipped *with accounting* in both engines.
5. merge_nodes must survive pathologically deep merge chains (no
   recursion limit / stack overflow).
"""

import io as _io

import numpy as np
import pytest

from pbdagcon_tpu.alignment import Alignment, normalize_gaps
from pbdagcon_tpu.config import DagconConfig
from pbdagcon_tpu.io import FastaWriter
from pbdagcon_tpu.oracle.graph import AlnGraph
from pbdagcon_tpu.ops.linearize import (
    backtrack,
    consensus_from_path,
    graph_from_group,
    host_scores,
    linearize,
)
from pbdagcon_tpu.pipeline import PipelineStats, run_stream
from pbdagcon_tpu.simulate import to_m5


def _run(text: str, cfg: DagconConfig) -> str:
    buf = _io.StringIO()
    run_stream(_io.StringIO(text), FastaWriter(buf), cfg)
    return buf.getvalue()


def _deep_insert_m5(n_reads: int = 150) -> str:
    """Pileup whose merged trailing-insertion node accumulates an edge
    count equal to the number of reads while per-column coverage stays
    at half that: reads 0..n/2-1 cover backbone base 1 (+ inserted G),
    reads n/2.. cover base 2 (+ inserted G). After merge_nodes the two
    G nodes (single out-edge to exit, same base) merge: exit edge count
    = n_reads > 127 while cov <= n_reads/2 < 128."""
    lines = []
    half = n_reads // 2
    for i in range(n_reads):
        if i < half:
            a = Alignment(id=f"r{i}", sid="t", tlen=2, start=1,
                          qstr="AG", tstr="A-")
        else:
            a = Alignment(id=f"r{i}", sid="t", tlen=2, start=2,
                          qstr="CG", tstr="C-")
        lines.append(to_m5(a.recompute_end()))
    return "\n".join(lines) + "\n"


def test_int8_squeeze_guards_edge_counts():
    text = _deep_insert_m5(150)
    cfg_host = DagconConfig(min_weight=1, min_length=1, backend="host")
    cfg_xla = DagconConfig(min_weight=1, min_length=1, backend="xla",
                           use_native=True)
    out_host = _run(text, cfg_host)
    out_xla = _run(text, cfg_xla)
    assert out_xla == out_host


def test_squeeze_returns_none_on_count_overflow():
    from pbdagcon_tpu.ops.dp import _squeeze_arena8, pad_batch

    g = graph_from_group("AC", [
        normalize_gaps(Alignment(id=f"r{i}", sid="t", tlen=2,
                                 start=1 if i < 75 else 2,
                                 qstr="AG" if i < 75 else "CG",
                                 tstr="A-" if i < 75 else "C-"))
        for i in range(150)
    ])
    lin = linearize(g, sid="t")
    assert int(lin.exit_count.max()) > 127  # the overflow scenario
    assert int(lin.cov.max()) <= 127
    batch = pad_batch([lin], V=256, W=16, K=8)
    assert _squeeze_arena8(batch) is None


def test_duplicate_sid_in_one_flush_window():
    a_dup = Alignment(id="r0", sid="dup", tlen=8, start=1,
                      qstr="ACGTACGT", tstr="ACGTACGT").recompute_end()
    a_dup2 = Alignment(id="r1", sid="dup", tlen=8, start=1,
                       qstr="TTTTTTTT", tstr="TTTTTTTT").recompute_end()
    a_other = Alignment(id="r2", sid="other", tlen=8, start=1,
                        qstr="GGGGGGGG", tstr="GGGGGGGG").recompute_end()
    text = "\n".join(to_m5(a) for a in (a_dup, a_other, a_dup2)) + "\n"
    cfg = DagconConfig(min_weight=1, min_length=1, backend="xla",
                       use_native=False)
    out = _run(text, cfg)
    # Three distinct groups, three distinct results, in input order.
    assert out == (
        ">dup/0_8\nACGTACGT\n>other/0_8\nGGGGGGGG\n>dup/0_8\nTTTTTTTT\n"
    )
    # And identical to the reference-equivalent host path.
    assert out == _run(text, DagconConfig(
        min_weight=1, min_length=1, backend="host", use_native=False))


def test_enter_exit_edge_parity():
    # 5 all-deletion records create an enter->exit edge (count 5) that
    # outscores the weakly-supported backbone path; oracle and the
    # linearized production path must agree (both emit nothing).
    backbone = "AC"
    alns = [
        Alignment(id=f"d{i}", sid="t", tlen=2, start=1,
                  qstr="--", tstr="AC")
        for i in range(5)
    ] + [
        Alignment(id="m", sid="t", tlen=2, start=1, qstr="AC", tstr="AC")
    ]
    g = AlnGraph(backbone)
    for a in alns:
        na = normalize_gaps(a.recompute_end())
        if not na.empty:
            g.add_aln(na)
    g.merge_nodes()
    oracle_res = g.consensus(min_weight=1, min_length=1)

    g2 = graph_from_group(
        backbone, [a.recompute_end() for a in alns]
    )
    lin = linearize(g2, sid="t")
    # enter's out-edges include the virtual exit target (n).
    assert int(lin.n) in set(lin.enter_tgt.tolist())
    path = backtrack(lin, host_scores(lin))
    lin_res = consensus_from_path(lin, path, 1, 1)
    assert [(r.range, r.seq) for r in oracle_res] == [
        (r.range, r.seq) for r in lin_res
    ]


def test_malformed_input_raises_in_loader_mode():
    from pbdagcon_tpu import native

    if not native.available():
        pytest.skip("native library not built")
    eng = native.NativeEngine()
    try:
        with pytest.raises(ValueError):
            eng.linearize_text(b"this is not an m5 record\n", fmt="m5")
    finally:
        eng.close()


def test_malformed_input_raises_end_to_end_loader():
    good = to_m5(Alignment(id="r", sid="t", tlen=6, start=1,
                           qstr="ACGTAC", tstr="ACGTAC").recompute_end())
    text = good + "\ngarbage record\n"
    cfg = DagconConfig(min_weight=1, min_length=1, backend="xla",
                       use_native=True)
    from pbdagcon_tpu import native

    if not native.available():
        pytest.skip("native library not built")
    with pytest.raises(ValueError):
        _run(text, cfg)


def test_raw_pair_without_align_counted_not_silent():
    # A raw 'pre' record (ungapped, mismatched lengths) without -a is
    # skipped in both engines — but counted in stats now.
    raw = "r0 t 1 6 6 ACGTACA ACGTAC"  # q has an extra base, no gaps
    gapped = "r1 t 1 6 6 ACGTAC ACGTAC"
    text = raw + "\n" + gapped + "\n"
    for use_native in (False, True):
        if use_native:
            from pbdagcon_tpu import native

            if not native.available():
                continue
        buf = _io.StringIO()
        stats = run_stream(
            _io.StringIO(text), FastaWriter(buf),
            DagconConfig(min_weight=1, min_length=1, fmt="pre",
                         backend="host", use_native=use_native),
        )
        assert isinstance(stats, PipelineStats)
        assert stats.dropped_records == 1, f"use_native={use_native}"
        assert buf.getvalue() == ">t/0_6\nACGTAC\n"


def test_deep_merge_chain_no_recursion_error():
    # A long identical insertion shared by several reads produces a merge
    # chain as deep as the insertion; the old recursive merge overflowed
    # Python's recursion limit (and risked the C++ stack at 100-500x).
    ins = "ACGT" * 400  # 1600-base shared insertion
    backbone = "AATT"
    alns = [
        Alignment(id=f"r{i}", sid="t", tlen=4, start=1,
                  qstr="AA" + ins + "TT", tstr="AA" + "-" * len(ins) + "TT")
        for i in range(3)
    ]
    g = AlnGraph(backbone)
    for a in alns:
        g.add_aln(normalize_gaps(a.recompute_end()))
    g.merge_nodes()  # must not raise RecursionError
    res = g.consensus(min_weight=1, min_length=1)
    assert res and ins in res[0].seq

    # Native engine agrees end to end.
    from pbdagcon_tpu import native

    if native.available():
        text = "\n".join(to_m5(a.recompute_end()) for a in alns) + "\n"
        out_native = _run(text, DagconConfig(
            min_weight=1, min_length=1, backend="host", use_native=True))
        out_py = _run(text, DagconConfig(
            min_weight=1, min_length=1, backend="host", use_native=False))
        assert out_native == out_py
        assert ins in out_native


def test_all_records_skipped_group_consistent():
    # A group whose records are ALL raw-skipped still recovers its
    # backbone (from the raw target string) and emits a backbone-only
    # consensus — identically in both engines, with the skip counted.
    raw_only = "r0 t 1 6 6 ACGTACA ACGTAC\n"  # only unusable records
    from pbdagcon_tpu import native

    if not native.available():
        pytest.skip("native library not built")
    outs = []
    for use_native in (True, False):
        buf = _io.StringIO()
        stats = run_stream(
            _io.StringIO(raw_only), FastaWriter(buf),
            DagconConfig(min_weight=1, min_length=1, fmt="pre",
                         backend="host", use_native=use_native),
        )
        assert stats.dropped_records == 1
        outs.append(buf.getvalue())
    assert outs[0] == outs[1]
