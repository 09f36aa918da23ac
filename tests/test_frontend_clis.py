"""CLI coverage for the hgap and dazcon frontends (argparse mains)."""

import os
import random

import pytest

from pbdagcon_tpu.simulate import NoiseProfile, random_seq, sample_read


@pytest.fixture()
def m4_and_reads(tmp_path):
    rng = random.Random(77)
    targets = {f"t{i}": random_seq(rng, 250) for i in range(2)}
    reads = dict(targets)
    m4_lines = []
    noise = NoiseProfile(sub=0.01, ins=0.05, dele=0.03)
    for tname, tseq in targets.items():
        for j in range(10):
            qstr, _ = sample_read(rng, tseq, 0, len(tseq), noise)
            qseq = qstr.replace("-", "")
            qname = f"{tname}_r{j}"
            reads[qname] = qseq
            m4_lines.append(
                f"{qname} {tname} {-5 * len(qseq)} 99.0 0 0 {len(qseq)} "
                f"{len(qseq)} 0 0 {len(tseq)} {len(tseq)} 254"
            )
    m4 = tmp_path / "ovl.m4"
    m4.write_text("\n".join(m4_lines) + "\n")
    fa = tmp_path / "reads.fa"
    fa.write_text(
        "".join(f">{n}\n{s}\n" for n, s in reads.items())
    )
    return str(m4), str(fa), targets


def test_hgap_cli(m4_and_reads, capsys):
    from pbdagcon_tpu.hgap import main

    m4, fa, targets = m4_and_reads
    rc = main([m4, fa, "--bestn", "20"])
    assert rc == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) == 20  # 10 overlaps per target survive
    # target-sorted 'pre' records with 7 fields
    assert all(len(l.split()) == 7 for l in lines)
    tnames = [l.split()[1] for l in lines]
    assert tnames == sorted(tnames)


def test_dazcon_cli(m4_and_reads, capsys):
    from pbdagcon_tpu.dazcon import main

    m4, fa, targets = m4_and_reads
    rc = main([m4, fa, "-c", "4", "-m", "100"])
    assert rc == 0
    out = capsys.readouterr().out
    seqs = {}
    cur = None
    for line in out.splitlines():
        if line.startswith(">"):
            cur = line[1:]
        else:
            seqs[cur] = seqs.get(cur, "") + line
    assert set(seqs) == set(targets)
    for tname, tseq in targets.items():
        assert seqs[tname] == tseq  # low noise: exact recovery
