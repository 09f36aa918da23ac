"""dazcon-equivalent frontend tests: hit selection, consensus_one flow."""

import io as _io
import random

from pbdagcon_tpu.dazcon import consensus_one_target, run_dazcon, select_hits
from pbdagcon_tpu.hgap import parse_m4
from pbdagcon_tpu.simulate import NoiseProfile, random_seq, sample_read


def _m4(q, t, score, qlen, tlen, tstrand=0):
    return parse_m4(
        f"{q} {t} {score} 99.0 0 0 {qlen} {qlen} {tstrand} 0 {tlen} {tlen} 254"
    )


def test_select_hits_orders_and_caps():
    recs = [
        _m4("q1", "t1", -100, 50, 50),
        _m4("q2", "t1", -900, 50, 50),
        _m4("q3", "t1", -500, 50, 50),
        _m4("t1", "t1", -999, 50, 50),  # self-hit dropped
        _m4("q1", "t2", -10, 50, 50),
    ]
    sel = select_hits(recs, max_hits=2)
    assert [r.qname for r in sel["t1"]] == ["q2", "q3"]
    assert [r.qname for r in sel["t2"]] == ["q1"]


def test_dazcon_end_to_end_recovers_target():
    rng = random.Random(41)
    tseq = random_seq(rng, 400)
    reads = {"A0": tseq}
    m4_lines = []
    noise = NoiseProfile(sub=0.01, ins=0.04, dele=0.03)
    for j in range(15):
        qstr, _ = sample_read(rng, tseq, 0, len(tseq), noise)
        qseq = qstr.replace("-", "")
        reads[f"B{j}"] = qseq
        m4_lines.append(
            f"B{j} A0 {-5 * len(qseq)} 99.0 0 0 {len(qseq)} {len(qseq)} "
            f"0 0 {len(tseq)} {len(tseq)} 254"
        )
    out = _io.StringIO()
    n = run_dazcon(
        _io.StringIO("\n".join(m4_lines) + "\n"), reads, out,
        min_weight=5, min_length=100, max_hits=85,
    )
    assert n == 1
    lines = out.getvalue().splitlines()
    assert lines[0] == ">A0"
    assert lines[1] == tseq  # low noise + realign: exact recovery


def test_dazcon_min_length_filter():
    rng = random.Random(42)
    tseq = random_seq(rng, 120)
    reads = {"A0": tseq, "B0": tseq, "B1": tseq}
    m4 = "\n".join(
        f"B{j} A0 -500 99.0 0 0 120 120 0 0 120 120 254" for j in range(2)
    )
    out = _io.StringIO()
    n = run_dazcon(_io.StringIO(m4), reads, out, min_weight=2,
                   min_length=500)
    assert n == 0 and out.getvalue() == ""
