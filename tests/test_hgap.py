"""HGAP glue tests: M4 parse/filter/join and the full preassembly flow."""

import io as _io
import random

from pbdagcon_tpu.alignment import revcomp
from pbdagcon_tpu.config import DagconConfig
from pbdagcon_tpu.hgap import (
    M4Record,
    filter_m4,
    m4_to_pre,
    parse_m4,
    read_fasta,
    run_hgap,
)
from pbdagcon_tpu.io import FastaWriter
from pbdagcon_tpu.pipeline import run_stream
from pbdagcon_tpu.simulate import NoiseProfile, random_seq, sample_read


def _mk_m4(q, t, score, qs=0, qe=None, qlen=None, ts=0, te=None, tlen=None,
           tstrand=0):
    qlen = qlen if qlen is not None else qe
    tlen = tlen if tlen is not None else te
    return f"{q} {t} {score} 99.0 0 {qs} {qe} {qlen} {tstrand} {ts} {te} {tlen} 254"


def test_parse_m4():
    r = parse_m4(_mk_m4("q1", "t1", -900, qs=0, qe=100, ts=5, te=105,
                        tlen=200))
    assert r.qname == "q1" and r.tname == "t1"
    assert r.score == -900 and r.tstart == 5 and r.tend == 105
    assert r.tlen == 200


def test_filter_m4_best_per_query():
    recs = [
        parse_m4(_mk_m4("q1", "t1", -500, qe=100, te=100)),
        parse_m4(_mk_m4("q1", "t2", -900, qe=100, te=100)),  # better
        parse_m4(_mk_m4("q2", "q2", -999, qe=100, te=100)),  # self-hit
        parse_m4(_mk_m4("q2", "t1", -100, qe=100, te=100)),
    ]
    out = filter_m4(recs, bestn=1)
    assert [(r.qname, r.tname) for r in out] == [("q1", "t2"), ("q2", "t1")]
    out2 = filter_m4(recs, bestn=2)
    assert [(r.qname, r.tname) for r in out2] == [
        ("q1", "t1"), ("q1", "t2"), ("q2", "t1"),
    ]


def test_read_fasta():
    fa = ">r1 extra stuff\nACGT\nACGT\n>r2\nTTTT\n"
    seqs = read_fasta(_io.StringIO(fa))
    assert seqs == {"r1": "ACGTACGT", "r2": "TTTT"}


def test_m4_to_pre_orientation():
    reads = {"q": "AACCGGTT", "t": "ACGTACGTACGT"}
    fwd = parse_m4(_mk_m4("q", "t", -10, qs=0, qe=8, ts=2, te=10, tlen=12))
    (line,) = m4_to_pre([fwd], reads)
    f = line.split()
    assert f[:5] == ["q", "t", "3", "10", "12"]
    assert f[5] == "AACCGGTT"
    assert f[6] == reads["t"][2:10]
    # Reverse-strand hit: query revcomped, target coords flipped forward.
    rev = parse_m4(_mk_m4("q", "t", -10, qs=0, qe=8, ts=2, te=10, tlen=12,
                          tstrand=1))
    (line,) = m4_to_pre([rev], reads)
    f = line.split()
    assert f[5] == revcomp("AACCGGTT")
    assert f[:5] == ["q", "t", "3", "10", "12"]


def test_full_hgap_flow_produces_consensus():
    """Overlaps + reads -> pre -> -a consensus reproduces each target."""
    rng = random.Random(31)
    targets = {f"t{i}": random_seq(rng, 300) for i in range(2)}
    reads: dict[str, str] = dict(targets)
    m4_lines = []
    noise = NoiseProfile(sub=0.01, ins=0.05, dele=0.03)
    for tname, tseq in targets.items():
        for j in range(12):
            qstr, tstr = sample_read(rng, tseq, 0, len(tseq), noise)
            qseq = qstr.replace("-", "")
            qname = f"{tname}_r{j}"
            reads[qname] = qseq
            m4_lines.append(
                _mk_m4(qname, tname, -5 * len(qseq), qs=0, qe=len(qseq),
                       ts=0, te=len(tseq), tlen=len(tseq))
            )
    pre_text = run_hgap(_io.StringIO("\n".join(m4_lines) + "\n"), reads,
                        bestn=20)
    cfg = DagconConfig(
        min_weight=4, min_length=50, fmt="pre", align=True, backend="host"
    )
    out = _io.StringIO()
    stats = run_stream(_io.StringIO(pre_text), FastaWriter(out), cfg)
    assert stats.targets == 2
    fasta = out.getvalue()
    # Low noise + -a realignment: consensus must equal each backbone.
    seqs = {}
    cur = None
    for line in fasta.splitlines():
        if line.startswith(">"):
            cur = line[1:].split("/")[0]
        else:
            seqs[cur] = seqs.get(cur, "") + line
    for tname, tseq in targets.items():
        assert seqs[tname] == tseq, f"consensus != backbone for {tname}"
