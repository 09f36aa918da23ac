"""Unit tests for alignment parsing / normalization / trimming (SPEC.md §1).

Mirrors the reference's AlignmentTest coverage (SURVEY.md §4): M5 parse
round-trips, normalizeGaps mismatch expansion + gap shifting, trimAln
coordinate bookkeeping.
"""

import pytest

from pbdagcon_tpu.alignment import (
    Alignment,
    backbone_from_group,
    group_by_target,
    normalize_gaps,
    parse_m5,
    parse_pre,
    revcomp,
    trim_aln,
)


def m5_line(
    qname="q1", qlen=10, qs=0, qe=10, qstrand="+",
    tname="t1", tlen=12, ts=0, te=10, tstrand="+",
    qstr="ACGTACGTAC", tstr="ACGTACGTAC",
):
    pat = "|" * len(qstr)
    return (
        f"{qname} {qlen} {qs} {qe} {qstrand} "
        f"{tname} {tlen} {ts} {te} {tstrand} "
        f"-100 10 0 0 0 254 {qstr} {pat} {tstr}"
    )


class TestParseM5:
    def test_basic_forward(self):
        a = parse_m5(m5_line(ts=2, te=12))
        assert (a.id, a.sid, a.tlen) == ("q1", "t1", 12)
        assert a.start == 3  # 0-based 2 -> 1-based 3
        assert a.end == 12
        assert a.qstr == "ACGTACGTAC"

    def test_reverse_strand_flips(self):
        a = parse_m5(m5_line(tstrand="-", ts=0, te=10, qstr="ACGTACGTAC",
                             tstr="ACGTACGTAC"))
        assert a.qstr == revcomp("ACGTACGTAC") == "GTACGTACGT"
        assert a.tstr == "GTACGTACGT"
        assert a.start == 12 - 10 + 1 == 3

    def test_gaps_survive_revcomp(self):
        a = parse_m5(m5_line(tstrand="-", qstr="AC-T", tstr="ACGT", qlen=3,
                             te=4))
        assert a.qstr == "A-GT"
        assert a.tstr == "ACGT"

    def test_field_count_error(self):
        with pytest.raises(ValueError):
            parse_m5("too few fields")

    def test_end_recomputed_from_tstr(self):
        a = parse_m5(m5_line(ts=1, te=11, qstr="ACGTA-GTAC", tstr="ACGT-CGTAC"))
        assert a.start == 2
        assert a.end == 2 - 1 + 9


class TestParsePre:
    def test_roundtrip(self):
        a = parse_pre("q7 t3 5 14 100 ACGT-ACGTA ACGTCA-GTA")
        assert (a.id, a.sid, a.start, a.end, a.tlen) == ("q7", "t3", 5, 14, 100)
        assert a.qstr == "ACGT-ACGTA"

    def test_length_mismatch_allowed_raw(self):
        # Raw (ungapped) pairs for the -a path parse fine (SPEC §1.5)...
        aln = parse_pre("q t 1 4 10 ACGT ACG")
        assert (aln.qstr, aln.tstr) == ("ACGT", "ACG")
        # ...but gapped-string consumers reject the mismatch.
        with pytest.raises(ValueError):
            normalize_gaps(aln)


class TestNormalizeGaps:
    def norm(self, q, t, start=1):
        return normalize_gaps(Alignment(id="q", sid="t", tlen=100,
                                        start=start, qstr=q, tstr=t))

    def test_identity_on_perfect_match(self):
        a = self.norm("ACGT", "ACGT")
        assert (a.qstr, a.tstr) == ("ACGT", "ACGT")

    def test_mismatch_expansion(self):
        # q A vs t C -> deletion of C then insertion of A
        a = self.norm("A", "C")
        assert (a.qstr, a.tstr) == ("-A", "C-")

    def test_match_columns_have_equal_bases(self):
        a = self.norm("ACTTAGC", "ACGTAGC")
        for qb, tb in zip(a.qstr, a.tstr):
            if qb != "-" and tb != "-":
                assert qb == tb

    def test_gap_push_right_target(self):
        # t gap then an equal base to the right: base moves left, gap right.
        a = self.norm("AAC", "A-C".replace("-", "-"))
        # expansion: no mismatches. tn='A-C', qn='AAC'; i=1: tn[1]='-',
        # next non-gap 'C' != qn[1]='A' -> unchanged.
        assert (a.qstr, a.tstr) == ("AAC", "A-C")

    def test_gap_push_collapses_del_plus_ins(self):
        # deletion of G then insertion of G collapses into a match
        a = self.norm("A-GC", "AG-C")
        assert (a.qstr, a.tstr) == ("AGC", "AGC")

    def test_mismatch_then_shift(self):
        # classic: q 'CA' vs t 'AC' with surrounding context
        a = self.norm("TCAT", "TACT")
        # expansion: T( -C/A- )( -A/C- )T ->
        # q: T -C -A T / t: T A- C- T ; pushes: q gap at i=1 looks right ->
        # 'C' vs t[1]... exercise determinism:
        assert len(a.qstr) == len(a.tstr)
        ungapped_q = a.qstr.replace("-", "")
        ungapped_t = a.tstr.replace("-", "")
        assert ungapped_q == "TCAT"
        assert ungapped_t == "TACT"

    def test_preserves_ungapped_strings_property(self):
        import random

        rng = random.Random(7)
        for _ in range(200):
            n = rng.randint(1, 30)
            q = []
            t = []
            for _i in range(n):
                r = rng.random()
                if r < 0.15:
                    q.append("-")
                    t.append(rng.choice("ACGT"))
                elif r < 0.3:
                    q.append(rng.choice("ACGT"))
                    t.append("-")
                else:
                    q.append(rng.choice("ACGT"))
                    t.append(rng.choice("ACGT"))
            qs, ts = "".join(q), "".join(t)
            a = self.norm(qs, ts)
            assert a.qstr.replace("-", "") == qs.replace("-", "")
            assert a.tstr.replace("-", "") == ts.replace("-", "")
            # no double-gap columns, no mismatching match columns
            for qb, tb in zip(a.qstr, a.tstr):
                assert not (qb == "-" and tb == "-")
                if qb != "-" and tb != "-":
                    assert qb == tb

    def test_start_and_end_preserved(self):
        a = self.norm("ACG", "ACC", start=11)
        assert a.start == 11
        assert a.end == 11 - 1 + 3


class TestTrimAln:
    def test_noop(self):
        a = Alignment(qstr="ACGT", tstr="ACGT", start=5, tlen=50).recompute_end()
        assert trim_aln(a, 0) is a

    def test_trims_query_bases_both_ends(self):
        a = Alignment(qstr="ACGTACGT", tstr="ACGTACGT", start=5,
                      tlen=50).recompute_end()
        b = trim_aln(a, 2)
        assert b.qstr == "GTAC"
        assert b.start == 7
        assert b.end == 7 - 1 + 4

    def test_trim_skips_gap_columns(self):
        #      q: - A C G T   trim 1 -> front removes cols 0,1 (-,A);
        #      t: G A C G T   back removes col 4 (T)
        a = Alignment(qstr="-ACGT", tstr="GACGT", start=1, tlen=50).recompute_end()
        b = trim_aln(a, 1)
        assert b.qstr == "CG"
        assert b.tstr == "CG"
        assert b.start == 3

    def test_overtrim_empties(self):
        a = Alignment(qstr="ACG", tstr="ACG", start=1, tlen=10).recompute_end()
        b = trim_aln(a, 5)
        assert b.empty


class TestGrouping:
    def test_group_by_target(self):
        alns = [Alignment(id=f"q{i}", sid=s) for i, s in
                enumerate(["a", "a", "b", "c", "c", "c"])]
        groups = list(group_by_target(alns))
        assert [(sid, len(g)) for sid, g in groups] == [("a", 2), ("b", 1), ("c", 3)]

    def test_backbone_recovery(self):
        # two records covering different windows of a 10bp target
        a1 = Alignment(id="q1", sid="t", tlen=10, start=1,
                       qstr="ACG-T", tstr="AC-GT").recompute_end()
        a2 = Alignment(id="q2", sid="t", tlen=10, start=4,
                       qstr="TACGTAC", tstr="TACGTAC").recompute_end()
        bb = backbone_from_group([a1, a2])
        assert bb == "ACGTACGTAC"

    def test_backbone_uncovered_is_n(self):
        a = Alignment(id="q", sid="t", tlen=6, start=2,
                      qstr="CGT", tstr="CGT").recompute_end()
        assert backbone_from_group([a]) == "NCGTNN"
