"""Tests for the exact graph engine (SPEC.md §2).

Mirrors the reference's AlnGraphBoostTest strategy (SURVEY.md §4): tiny
hand-written pileups with known merged topology and consensus, e.g.
all-identical reads reproduce the backbone and a majority SNP/indel flips
the call.
"""

from pbdagcon_tpu.alignment import Alignment, normalize_gaps
from pbdagcon_tpu.config import DagconConfig
from pbdagcon_tpu.oracle import AlnGraph, build_graph, consensus_for_group


def aln(q, t, start=1, sid="t", qid="q", tlen=None):
    tlen = tlen if tlen is not None else (start - 1 + len(t.replace("-", "")))
    return Alignment(id=qid, sid=sid, tlen=tlen, start=start,
                     qstr=q, tstr=t).recompute_end()


def reads(backbone, seqs, start=1):
    """Perfect-alignment helper: each (q, t) pair is ungapped-equal-length."""
    return [aln(q, t, start=start, qid=f"q{i}") for i, (q, t) in enumerate(seqs)]


class TestGraphBasics:
    def test_backbone_chain(self):
        g = AlnGraph("ACGT")
        assert g.L == 4
        assert g.base[1:5] == bytearray(b"ACGT")
        assert g.out_e[0] == {1: 0}
        assert g.out_e[4] == {5: 0}
        assert g.weight[1:5] == [1, 1, 1, 1]

    def test_identical_reads_reproduce_backbone(self):
        bb = "ACGTACGTGG"
        g = build_graph(bb, [aln(bb, bb, qid=f"q{i}") for i in range(10)])
        assert g.dangling_nodes() == set()
        res = g.consensus(min_weight=8, min_length=1)
        assert len(res) == 1
        assert res[0].seq == bb
        assert res[0].range == (0, len(bb))

    def test_consensus_one_matches(self):
        bb = "ACGTACGTGG"
        g = build_graph(bb, [aln(bb, bb, qid=f"q{i}") for i in range(10)])
        assert g.consensus_one(min_weight=8) == bb

    def test_majority_snp_flips_call(self):
        bb = "ACGTACGTAC"
        mut = "ACGTTCGTAC"  # A->T at position 5
        pile = [aln(mut, bb, qid=f"m{i}") for i in range(7)]
        pile += [aln(bb, bb, qid=f"w{i}") for i in range(3)]
        g = build_graph(bb, pile)
        res = g.consensus(min_weight=3, min_length=1)
        assert len(res) == 1
        assert res[0].seq == mut

    def test_minority_snp_ignored(self):
        bb = "ACGTACGTAC"
        mut = "ACGTTCGTAC"
        pile = [aln(bb, bb, qid=f"w{i}") for i in range(8)]
        pile += [aln(mut, bb, qid=f"m{i}") for i in range(2)]
        g = build_graph(bb, pile)
        res = g.consensus(min_weight=3, min_length=1)
        assert res[0].seq == bb

    def test_majority_insertion(self):
        bb = "AAAACCCC"
        #         insert GG between pos 4 and 5
        q = "AAAAGGCCCC"
        t = "AAAA--CCCC"
        pile = [aln(q, t, qid=f"i{i}") for i in range(6)]
        pile += [aln(bb, bb, qid=f"w{i}") for i in range(2)]
        g = build_graph(bb, pile)
        res = g.consensus(min_weight=3, min_length=1)
        assert res[0].seq == "AAAAGGCCCC"

    def test_majority_deletion(self):
        bb = "AAAAGCCCC"
        q = "AAAA-CCCC"
        pile = [aln(q, bb, qid=f"d{i}") for i in range(7)]
        pile += [aln(bb, bb, qid=f"w{i}") for i in range(2)]
        g = build_graph(bb, pile)
        res = g.consensus(min_weight=3, min_length=1)
        assert res[0].seq == "AAAACCCC"

    def test_merge_shares_identical_insertions(self):
        bb = "AACC"
        q, t = "AAGCC", "AA-CC"
        g = AlnGraph(bb)
        for i in range(3):
            g.add_aln(normalize_gaps(aln(q, t, qid=f"q{i}")))
        # before merge: 3 separate insertion nodes
        pre = sum(1 for v in range(len(g.base))
                  if not g.backbone_f[v] and not g.deleted[v])
        assert pre == 3
        g.merge_nodes()
        post = sum(1 for v in range(len(g.base))
                   if not g.backbone_f[v] and not g.deleted[v])
        assert post == 1
        alive_ins = [v for v in range(len(g.base))
                     if not g.backbone_f[v] and not g.deleted[v]]
        assert g.weight[alive_ins[0]] == 3

    def test_merge_suffix_sharing(self):
        bb = "AACC"
        g = AlnGraph(bb)
        # read 1 inserts "GA", read 2 inserts "A" at the same anchor:
        g.add_aln(normalize_gaps(aln("AAGACC", "AA--CC", qid="q1")))
        g.add_aln(normalize_gaps(aln("AAACC", "AA-CC", qid="q2")))
        g.merge_nodes()
        alive_ins = [v for v in range(len(g.base))
                     if not g.backbone_f[v] and not g.deleted[v]]
        # 'A' nodes merged (shared suffix), 'G' stays: 2 alive insertion nodes
        assert len(alive_ins) == 2
        weights = sorted(g.weight[v] for v in alive_ins)
        assert weights == [1, 2]

    def test_uncovered_backbone_penalized(self):
        # reads only cover positions 3..8 of a 10bp backbone; with
        # min_weight 2 the consensus is just the covered window.
        bb = "GGACGTACGG"
        window = bb[2:8]
        pile = [aln(window, window, start=3, qid=f"q{i}", tlen=10)
                for i in range(5)]
        g = build_graph(bb, pile)
        res = g.consensus(min_weight=2, min_length=1)
        assert len(res) == 1
        assert res[0].seq == window
        assert res[0].range == (2, 8)

    def test_min_length_filters_fragments(self):
        bb = "GGACGTACGG"
        window = bb[2:8]
        pile = [aln(window, window, start=3, qid=f"q{i}", tlen=10)
                for i in range(5)]
        g = build_graph(bb, pile)
        assert g.consensus(min_weight=2, min_length=7) == []

    def test_wide_coverage_gap_truncates(self):
        # coverage on [1,6] and [11,16] of a 16bp backbone, none between:
        # the best path takes the read->exit shortcut at the gap (SPEC
        # §2.7 note) — min-coverage trimming drops the downstream region.
        bb = "ACGTACGGTTACGTAC"
        left, right = bb[:6], bb[10:]
        pile = [aln(left, left, start=1, qid=f"l{i}", tlen=16) for i in range(4)]
        pile += [aln(right, right, start=11, qid=f"r{i}", tlen=16) for i in range(4)]
        g = build_graph(bb, pile)
        res = g.consensus(min_weight=2, min_length=2)
        assert [r.seq for r in res] == [left]
        assert res[0].range == (0, 6)

    def test_narrow_hole_splits_fragments(self):
        # one uncovered column between two strongly covered regions: the
        # path traverses the hole (cheaper than exiting) and the hole's
        # weight-1 node splits the output into two fragments.
        bb = "ACGTACGTTACGTA"  # L=14, hole at position 7
        left, right = bb[:6], bb[7:]
        pile = [aln(left, left, start=1, qid=f"l{i}", tlen=14) for i in range(8)]
        pile += [aln(right, right, start=8, qid=f"r{i}", tlen=14) for i in range(8)]
        g = build_graph(bb, pile)
        res = g.consensus(min_weight=2, min_length=2)
        assert [r.seq for r in res] == [left, right]
        assert res[0].range == (0, 6)
        assert res[1].range == (7, 14)

    def test_merge_insertion_into_backbone(self):
        # read deletes backbone G at pos 3 but re-inserts G anchored at 2:
        # graph merge should fold it back into a match on the backbone.
        bb = "AAGCC"
        g = AlnGraph(bb)
        # alignment: q AG-CC / t A-GCC at start=2 would normalize away, so
        # construct the un-normalizable variant with an intervening base:
        # q: A G T C C   t: A - G C C -> ins G anchored@2... normalize pushes
        # Use raw add_aln (bypassing normalize) to pin the merge semantics:
        g.add_aln(aln("AG-CC", "A-GCC", start=2, tlen=5))
        g.merge_nodes()
        # insertion node G merged into backbone node 3 (base G)
        alive_ins = [v for v in range(len(g.base))
                     if not g.backbone_f[v] and not g.deleted[v]]
        assert alive_ins == []
        assert g.weight[3] == 2  # backbone 1 + merged insertion weight 1

    def test_dangling_empty_after_merge(self):
        bb = "ACGTACGTACGTACGT"
        import random

        rng = random.Random(3)
        pile = []
        for i in range(20):
            s = rng.randint(1, 4)
            e = rng.randint(12, 16)
            seq = bb[s - 1 : e]
            pile.append(aln(seq, seq, start=s, qid=f"q{i}", tlen=16))
        g = build_graph(bb, pile)
        assert g.dangling_nodes() == set()


class TestPipeline:
    def test_consensus_for_group(self):
        bb = "ACGT" * 30
        cfg = DagconConfig(min_weight=3, min_length=10)
        pile = [aln(bb, bb, qid=f"q{i}") for i in range(6)]
        res = consensus_for_group(bb, pile, cfg)
        assert len(res) == 1
        assert res[0].seq == bb

    def test_trim_applied(self):
        bb = "ACGT" * 30
        cfg = DagconConfig(min_weight=3, min_length=10, trim=10)
        pile = [aln(bb, bb, qid=f"q{i}") for i in range(6)]
        res = consensus_for_group(bb, pile, cfg)
        assert len(res) == 1
        assert res[0].seq == bb[10:-10]
