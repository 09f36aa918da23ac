"""Device-side graph construction: order-free merged-graph build.

Re-architects `AlnGraphBoost::addAln` + `mergeNodes` (reference
`src/cpp/AlnGraphBoost.cpp`, SURVEY.md §3.3; reconstructed — mount empty)
as a *data-parallel, order-free* tensor computation, per the round-2
design in docs/DEVICE_GRAPH_BUILD.md:

The merged alignment graph is exactly:
  - the backbone chain (nodes 1..L) with vote/coverage/transition counts
    (pure segment sums over reads), plus
  - one *suffix trie* per termination anchor t (a backbone node or exit):
    every maximal inserted-base chain of every read, keyed by its
    (termination t, reversed base string), collapses into the trie of
    reversed strings; node weights and edge counts are chain counts
    through each trie node — all order-free sums.

Two reference behaviours that look order-dependent are in fact
deterministic and are handled exactly:

  - **Survivor anchors.** The merge survivor is the first group member
    in in-edge creation order; in-edge lists append in thread order, so
    the survivor of every pure-trie merge group is the node of the
    *first-created chain* through it (read order), at every depth (the
    victim redirection appends victims' in-edges in victim order, which
    is again read order). A trie node's anchor — the only attribute the
    DP reads, via `coverage(anchor)` — is therefore the anchor of its
    first contributing chain.
  - **Backbone absorption.** An out-degree-1 backbone node t-1 whose
    base equals a depth-1 trie node at t joins that merge group — and is
    always its survivor, because the constructor's chain edge (t-1 -> t)
    precedes every read edge in t's in-edge list. The trie node is
    absorbed into the backbone node: its weight joins the backbone
    weight, its edge count joins the t-1 -> t transition, and its
    subtree re-terminates at t-1, merging into trie(t-1) *after* the
    original chains (redirected edges append at the tail).

What cannot be reproduced order-free is flagged for host fallback:

  (a) second-order absorption cascades (an absorption creating a new
      absorption opportunity at t-1), and
  (b) DP argmax ties on the chosen path (the reference tie-break is
      first-strict-max in edge creation order).

Unflagged targets are provably bit-identical; the module tests verify
this differentially over the simulator soak.

This module is the NumPy oracle for the JAX/device implementation in
`ops/devbuild_jax.py`; both emit a standard `LinearGraph` (device node
order: per termination, trie postorder then the backbone node), so the
existing banded DP, backtrack, and emission machinery is reused as is.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from pbdagcon_tpu.alignment import Alignment, normalize_gaps, trim_aln
from pbdagcon_tpu.ops.linearize import NO_EDGE, LinearGraph

# Ops in the encoded column stream (normalized alignment columns).
OP_PAD = 0
OP_MATCH = 1
OP_DEL = 2
OP_INS = 3

# Build flags: nonzero -> host fallback required for exactness.
FLAG_CASCADE = 1  # absorption cascade deeper than MAX_ABSORB_ROUNDS

# Absorption cascades are handled exactly up to this many rounds; the
# cap exists because the device build packs the strip phase into 2 bits
# of its int32 sort keys (phases 0..3). Deeper cascades flag the target.
MAX_ABSORB_ROUNDS = 3
FLAG_SENTINEL_BASE = 4  # inserted base collides with ^/$ sentinels
FLAG_TIE = 8  # ambiguous-key tie on the chosen path (backtrack)
FLAG_OVERFLOW = 16  # capacity overflow in the fixed-shape device build

# Creation keys are 32-bit (device-friendly; JAX x64 is off):
#   (phase:2b << 28) | (gpre:14b << 14) | (read:14b)
# phase 0 = ctor, 1 = threaded, 2 = merge-redirected; gpre = GLOBAL
# preorder rank of the merged node (nodes sorted by (termination, DFS
# preorder)) — order-isomorphic to the (Kahn time, in-trie preorder)
# event pair; read = creating/first-victim read index. Bit 30 marks
# ambiguous keys (absorption-strip interactions): compare with
# KEY_MASK; a score tie involving an uncertain key flags the target.
KEY_UNCERTAIN = 1 << 30
KEY_MASK = KEY_UNCERTAIN - 1
KEY_LIMIT = 1 << 14  # caps for gpre and read fields


@dataclasses.dataclass
class EncodedGroup:
    """Host-encoded pileup: the device-build wire format.

    One target's normalized alignments as per-read column streams:
    `ops[r, c]` in {PAD, MATCH, DEL, INS}; inserted bases appear in
    `ins_base` in (read-major, column) order. This is the only thing
    uploaded — ~5x smaller than the banded graph arrays it replaces.
    """

    sid: str
    backbone: np.ndarray  # uint8 [L]
    starts: np.ndarray  # int32 [R], 1-based first consumed target pos
    ops: np.ndarray  # uint8 [R, C] column ops (padded)
    ncols: np.ndarray  # int32 [R]
    ins_base: np.ndarray  # uint8 [NI] inserted bases, stream order
    ins_off: np.ndarray  # int32 [R+1] per-read offsets into ins_base


def encode_group(
    backbone: str,
    alns: list[Alignment],
    trim: int = 0,
    sid: str = "",
    normalized: bool = False,
) -> EncodedGroup:
    """Normalize/trim and encode one pileup (host side, oracle version).

    Mirrors the graph-build preamble of the reference consensus worker
    (SURVEY.md §3.1) up to — but not including — `addAln`.
    """
    streams: list[tuple[int, np.ndarray, np.ndarray]] = []
    for aln in alns:
        if trim > 0:
            aln = trim_aln(aln, trim)
        if not normalized:
            aln = normalize_gaps(aln)
        if aln.empty:
            continue
        q = np.frombuffer(aln.qstr.encode(), dtype=np.uint8)
        t = np.frombuffer(aln.tstr.encode(), dtype=np.uint8)
        gap = ord("-")
        ops = np.where(
            (q != gap) & (t != gap),
            OP_MATCH,
            np.where(q == gap, OP_DEL, OP_INS),
        ).astype(np.uint8)
        streams.append((aln.start, ops, q[ops == OP_INS]))
    R = len(streams)
    C = max((len(o) for _, o, _ in streams), default=0)
    ops_arr = np.zeros((R, C), dtype=np.uint8)
    starts = np.zeros(R, dtype=np.int32)
    ncols = np.zeros(R, dtype=np.int32)
    ins_parts: list[np.ndarray] = []
    ins_off = np.zeros(R + 1, dtype=np.int32)
    for r, (start, ops, ib) in enumerate(streams):
        starts[r] = start
        ncols[r] = len(ops)
        ops_arr[r, : len(ops)] = ops
        ins_parts.append(ib)
        ins_off[r + 1] = ins_off[r] + len(ib)
    return EncodedGroup(
        sid=sid,
        backbone=np.frombuffer(backbone.encode(), dtype=np.uint8).copy(),
        starts=starts,
        ops=ops_arr,
        ncols=ncols,
        ins_base=(
            np.concatenate(ins_parts)
            if ins_parts
            else np.zeros(0, dtype=np.uint8)
        ),
        ins_off=ins_off,
    )


@dataclasses.dataclass
class _Chain:
    """One maximal inserted run: start anchor p (0 = enter), termination
    t (L+1 = exit), bases in insertion order with per-base anchors, and
    the creating read index (thread order — creation-order keys)."""

    p: int
    t: int
    bases: tuple[int, ...]
    anchors: tuple[int, ...]
    r: int


def _walk_reads(enc: EncodedGroup):
    """Per-read walk of the column streams -> coverage/weight sums,
    anchor-transition pairs, and inserted chains (the `addAln` events,
    SPEC §2.4, accumulated instead of threaded)."""
    L = len(enc.backbone)
    cov = np.zeros(L + 2, dtype=np.int64)
    matches = np.zeros(L + 2, dtype=np.int64)
    transitions: list[tuple[int, int, int]] = []  # (p, q, read)
    chains: list[_Chain] = []
    R = enc.ops.shape[0]
    for r in range(R):
        tpos = int(enc.starts[r]) - 1
        prev = 0  # enter; first emitted node links from enter
        cur_b: list[int] = []
        cur_a: list[int] = []
        chain_p = 0
        ii = int(enc.ins_off[r])
        ops = enc.ops[r, : int(enc.ncols[r])]
        for op in ops:
            if op == OP_MATCH:
                tpos += 1
                cov[tpos] += 1
                matches[tpos] += 1
                if cur_b:
                    chains.append(
                        _Chain(chain_p, tpos, tuple(cur_b), tuple(cur_a), r)
                    )
                    cur_b, cur_a = [], []
                else:
                    transitions.append((prev, tpos, r))
                prev = tpos
                chain_p = tpos
            elif op == OP_DEL:
                tpos += 1
                cov[tpos] += 1
            elif op == OP_INS:
                cur_b.append(int(enc.ins_base[ii]))
                cur_a.append(tpos)
                ii += 1
        if cur_b:
            chains.append(
                _Chain(chain_p, L + 1, tuple(cur_b), tuple(cur_a), r)
            )
        else:
            transitions.append((prev, L + 1, r))
    return cov, matches, transitions, chains


def build_linear(
    enc: EncodedGroup,
) -> tuple[LinearGraph | None, int, "BuildKeys | None"]:
    """Order-free merged-graph build -> (LinearGraph in device node
    order, flags, creation keys). Returns (None, flags, None) when
    flagged (host fallback).

    Node order: for t = 1..L+1, trie(t) nodes in DFS postorder (children
    in ascending-base order, deeper before shallower), then backbone t
    (t <= L). This is a valid topological order of the merged graph —
    identical to what the sorted-chains device build produces.
    """
    L = len(enc.backbone)
    cov, matches, transitions, chains = _walk_reads(enc)

    if any(
        b in (94, 36) for ch in chains for b in ch.bases
    ):  # '^' / '$'
        return None, FLAG_SENTINEL_BASE, None

    # Edge creation keys reproduce the reference's in/out-list order for
    # the backtrack's first-strict-max tie-break, order-free:
    #   phase 0 = constructor chain edge (always first),
    #   phase 1 = thread-created, ordered by creating read index
    #             (each read creates at most one out-edge per node),
    #   phase 2 = merge-redirected (appended at tails), ordered by the
    #             redirect event = global preorder rank of the merged
    #             node, then victim read index.
    # An edge's key is its FIRST creation; later count bumps keep it.
    # Keys whose exact event rank is ambiguous (absorption-strip
    # interactions) carry KEY_UNCERTAIN: they only matter if an actual
    # score tie involves one, which the backtrack flags for fallback.
    def key_int(
        phase: int, gpre: int = 0, rd: int = 0, uncertain: bool = False,
    ) -> int:
        k = (phase << 28) | (gpre << 14) | rd
        if uncertain:
            k |= KEY_UNCERTAIN
        return k

    KEY_CTOR = 0
    if enc.ops.shape[0] >= KEY_LIMIT:
        return None, FLAG_OVERFLOW, None

    # Transition counts keyed (p, q) -> [count, key]; grows during
    # absorption.
    tcount: dict[tuple[int, int], list] = {}

    def bump(d: dict, k, c: int, key: int) -> None:
        e = d.get(k)
        if e is None:
            d[k] = [c, key]
        else:
            e[0] += c
            e[1] = min(e[1], key)

    for p, q, r in transitions:
        bump(tcount, (p, q), 1, key_int(1, rd=r))


    # Static out-degree-1 backbone set: p (1..L) whose only successor is
    # p+1 — no skip transitions and no chain starts from p. (Absorption
    # never changes membership: redirected start edges land on nodes
    # whose sources already had out-degree >= 2.)
    multi_out: set[int] = set()
    for p, q, _r in transitions:
        if q != p + 1:
            multi_out.add(p)
    for ch in chains:
        multi_out.add(ch.p)

    def outdeg1(p: int) -> bool:
        return 1 <= p <= L and p not in multi_out

    # ---- backbone absorption passes (exact, order-free) ---------------
    # Chain records (phase, seq) preserve reference creation order:
    # original chains in read order (phase 0), absorption strips after
    # them per cascade round (phase k = stripped in round k). Exactness
    # of the phase ordering: a round-k strip into trie(pm) is a redirect
    # event at Kahn time pm + k (the cascade recursion runs entirely
    # inside merge_in_nodes of the top column), so for a fixed trie the
    # rounds arrive in increasing k, and within one round all strips
    # come from the single absorbed depth-1 node whose in-list order is
    # read/seq order. Rounds beyond MAX_ABSORB_ROUNDS flag the target
    # (the device build packs the phase into 2 bits of its int32 keys).
    # rec = (phase, seq, p, t, bases, anchors, read)
    recs: list[tuple] = [
        (0, i, ch.p, ch.t, ch.bases, ch.anchors, ch.r)
        for i, ch in enumerate(chains)
    ]
    weight_bonus = np.zeros(L + 2, dtype=np.int64)
    uncertain_tries: set[int] = set()
    live = recs
    for round_no in range(1, MAX_ABSORB_ROUNDS + 2):
        by_t: dict[int, list[int]] = {}
        for i, r in enumerate(live):
            by_t.setdefault(r[3], []).append(i)
        dead: set[int] = set()
        strips: list[tuple] = []
        for t, idxs in by_t.items():
            pm = t - 1
            if not outdeg1(pm):
                continue
            b = int(enc.backbone[pm - 1])
            group = [ri for ri in idxs if live[ri][4][-1] == b]
            if not group:
                continue
            if round_no > MAX_ABSORB_ROUNDS:
                return None, FLAG_CASCADE, None
            # Depth-1 node (t, b) merges INTO backbone pm (the ctor edge
            # pm->t precedes every read edge, so pm is always survivor).
            weight_bonus[pm] += len(group)
            bump(tcount, (pm, t), len(group), KEY_CTOR)
            for ri in group:
                dead.add(ri)
                _ph, seq, p, _t, bases, anchors, rd = live[ri]
                if len(bases) >= 2:
                    strips.append(
                        (round_no, seq, p, pm, bases[:-1], anchors[:-1], rd)
                    )
                else:
                    # Redirected start edge becomes a (p, pm) edge
                    # appended at p's out-list tail (phase 2), unless
                    # p->pm existed. Its exact event rank references the
                    # removed branch -> uncertain.
                    bump(
                        tcount, (p, pm), 1,
                        key_int(2, rd=rd, uncertain=True),
                    )
        if not dead:
            break
        uncertain_tries.update(r[3] for r in strips)
        live = [r for i, r in enumerate(live) if i not in dead] + strips
    final_recs = sorted(live, key=lambda r: (r[3], r[0], r[1]))

    # ---- trie construction per termination t --------------------------
    # node: {"w": #chains through, "anchor": first-chain anchor (the
    #        reference survivor's), "children": {base: node},
    #        "starts": {p: [count, min read, any-strip]},
    #        "first_*": survivor-chain info for start-edge key phases}
    tries: dict[int, dict] = {}

    def new_node() -> dict:
        return {
            "w": 0, "anchor": -1, "children": {}, "starts": {},
            "first_deepest": False, "first_p": -1, "first_rd": -1,
        }

    for ph, _seq, p, t, bases, anchors, rd in final_recs:
        root = tries.setdefault(t, new_node())
        node = root
        m = len(bases)
        for d in range(1, m + 1):
            b = bases[m - d]
            a = anchors[m - d]
            node = node["children"].setdefault(b, new_node())
            node["w"] += 1
            if node["anchor"] < 0:
                # First (phase-sorted) chain through this node == the
                # reference merge survivor: its anchor and — when it
                # ends exactly here — its thread-created start edge.
                node["anchor"] = a
                node["first_deepest"] = d == m
                node["first_p"] = p
                node["first_rd"] = rd
        se = node["starts"].get(p)
        if se is None:
            node["starts"][p] = [1, rd, ph >= 1]
        else:
            se[0] += 1
            se[1] = min(se[1], rd)
            se[2] = se[2] or ph >= 1

    # ---- linear node numbering ---------------------------------------
    # Postorder per trie; then backbone t.
    order: list[tuple] = []  # ("trie", t, node) / ("bb", p)
    parent_lin: dict[int, int] = {}  # id(node) -> lin idx of its parent

    def post(node: dict, out: list[dict]) -> None:
        for b in sorted(node["children"]):
            post(node["children"][b], out)
            out.append(node["children"][b])

    trie_nodes: dict[int, list[dict]] = {}
    for t, root in tries.items():
        lst: list[dict] = []
        post(root, lst)
        trie_nodes[t] = lst

    lin_nodes: list[tuple[str, int, dict | None, int]] = []
    # (kind, t_or_p, node, base)
    for t in range(1, L + 2):
        for node in trie_nodes.get(t, []):
            lin_nodes.append(("trie", t, node, -1))
        if t <= L:
            lin_nodes.append(("bb", t, None, int(enc.backbone[t - 1])))
    n = len(lin_nodes)

    lin_of_node: dict[int, int] = {}
    lin_of_bb = np.full(L + 2, -1, dtype=np.int64)
    for i, (kind, t, node, _b) in enumerate(lin_nodes):
        if kind == "trie":
            lin_of_node[id(node)] = i
        else:
            lin_of_bb[t] = i

    # base char per trie node: recover from parent-child structure.
    base_of_node: dict[int, int] = {}
    for t, root in tries.items():
        stack = [root]
        while stack:
            nd = stack.pop()
            for b, c in nd["children"].items():
                base_of_node[id(c)] = b
                stack.append(c)

    # ---- per-node arrays + CSR edges ---------------------------------
    base = np.zeros(n, dtype=np.uint8)
    weight = np.zeros(n, dtype=np.int32)
    bb = np.zeros(n, dtype=np.int32)
    covl = np.zeros(n, dtype=np.int32)
    unsup = np.zeros(n, dtype=bool)
    exit_count = np.full(n, NO_EDGE, dtype=np.int32)
    edge_off = np.zeros(n + 1, dtype=np.int32)
    tgt_list: list[int] = []
    cnt_list: list[int] = []

    # Global preorder ranks (tries in ascending termination order; DFS
    # within each trie, children ascending base, parent first): the rank
    # of a node is the event time of its group's merge — the phase-2
    # key ordering (order-isomorphic to (Kahn pop time, in-trie
    # preorder)).
    pre_rank: dict[int, int] = {}
    k = 0
    for t in sorted(tries):
        root = tries[t]
        stack = [root]
        while stack:
            nd = stack.pop()
            for b in sorted(nd["children"], reverse=True):
                stack.append(nd["children"][b])
            if nd is not root:
                pre_rank[id(nd)] = k
                k += 1
    if k >= KEY_LIMIT:
        return None, FLAG_OVERFLOW, None

    # Start edges grouped per source anchor:
    # p -> [(lin_tgt, count, key)]. A start edge keeps its thread
    # position iff the node's survivor chain ends exactly at the node
    # and starts at p; otherwise it was redirected when the node's group
    # merged (phase 2, event = (t, preorder, first victim read)).
    starts_from: dict[int, list[tuple[int, int, int]]] = {}
    for t, lst in trie_nodes.items():
        unc_t = t in uncertain_tries
        for node in lst:
            for p, (c, min_rd, has_strip) in node["starts"].items():
                if node["first_deepest"] and node["first_p"] == p:
                    key = key_int(1, rd=node["first_rd"])
                else:
                    key = key_int(
                        2, gpre=pre_rank[id(node)], rd=min_rd,
                        uncertain=unc_t or has_strip,
                    )
                starts_from.setdefault(p, []).append(
                    (lin_of_node[id(node)], c, key)
                )
    for p in starts_from:
        starts_from[p].sort()

    # Transitions grouped by source.
    trans_from: dict[int, list[tuple[int, int, int]]] = {}
    for (p, q), (c, key) in tcount.items():
        if q == p + 1:
            continue  # ctor chain edge, emitted first below
        trans_from.setdefault(p, []).append(
            (int(lin_of_bb[q]) if q <= L else n, c, key)
        )
    for p in trans_from:
        trans_from[p].sort()

    span = 0

    def out_edges_of_bb(p: int) -> list[tuple[int, int, int]]:
        """(target lin or n for exit, count, creation key); list order is
        arbitrary — the backtrack orders by key."""
        out: list[tuple[int, int, int]] = []
        chain_tgt = lin_of_bb[p + 1] if p + 1 <= L else n
        cc = tcount.get((p, p + 1))
        out.append((int(chain_tgt), cc[0] if cc else 0, KEY_CTOR))
        out.extend(trans_from.get(p, []))
        out.extend(starts_from.get(p, []))
        return out

    for i, (kind, t, node, _b) in enumerate(lin_nodes):
        if kind == "trie":
            assert node is not None
            base[i] = base_of_node[id(node)]
            weight[i] = node["w"]
            bb[i] = 0
            covl[i] = int(cov[node["anchor"]])
            unsup[i] = False
        else:
            base[i] = enc.backbone[t - 1]
            weight[i] = 1 + int(matches[t]) + int(weight_bonus[t])
            bb[i] = t
            covl[i] = int(cov[t])
            unsup[i] = weight[i] == 1

    # Parent map for trie nodes.
    parent_map: dict[int, tuple[int, int]] = {}  # id -> (t, parent lin | -t)
    for t, root in tries.items():
        stack = [(root, True)]
        while stack:
            nd, is_root = stack.pop()
            for b, c in nd["children"].items():
                if is_root:
                    ptgt = int(lin_of_bb[t]) if t <= L else n
                else:
                    ptgt = lin_of_node[id(nd)]
                parent_map[id(c)] = (t, ptgt)
                stack.append((c, False))

    key_list: list[int] = []
    for i, (kind, t, node, _b) in enumerate(lin_nodes):
        if kind == "trie":
            assert node is not None
            _t, ptgt = parent_map[id(node)]
            c = node["w"]
            if ptgt == n:
                exit_count[i] = c
            tgt_list.append(ptgt)
            cnt_list.append(c)
            key_list.append(0)  # single out-edge: no tie possible
            if ptgt != n:
                span = max(span, ptgt - i)
        else:
            for tgt, c, key in out_edges_of_bb(t):
                if tgt == n:
                    exit_count[i] = c
                else:
                    span = max(span, tgt - i)
                tgt_list.append(tgt)
                cnt_list.append(c)
                key_list.append(key)
        edge_off[i + 1] = len(tgt_list)

    enter_edges = out_edges_of_bb(0)
    enter_tgt = np.array([t for t, _c, _k in enter_edges], dtype=np.int32)
    enter_cnt = np.array([c for _t, c, _k in enter_edges], dtype=np.int32)
    enter_key = np.array([k for _t, _c, k in enter_edges], dtype=np.int32)

    lin = LinearGraph(
        sid=enc.sid,
        backbone_len=L,
        n=n,
        span=span,
        base=base,
        weight=weight,
        bb=bb,
        cov=covl,
        unsup=unsup,
        exit_count=exit_count,
        edge_off=edge_off,
        edge_tgt=np.array(tgt_list, dtype=np.int32),
        edge_cnt=np.array(cnt_list, dtype=np.int32),
        enter_tgt=enter_tgt,
        enter_cnt=enter_cnt,
    )
    keys = BuildKeys(
        edge_key=np.array(key_list, dtype=np.int32),
        enter_key=enter_key,
    )
    return lin, 0, keys


@dataclasses.dataclass
class BuildKeys:
    """Edge creation-order keys (see build_linear): the backtrack picks
    the minimum key among score-tied candidates, reproducing the
    reference's first-strict-max-in-creation-order exactly."""

    edge_key: np.ndarray  # int32 [E], parallel to edge_tgt/edge_cnt
    enter_key: np.ndarray  # int32 [E0]


def backtrack_keys(
    lin: LinearGraph, keys: BuildKeys, scores: np.ndarray
) -> tuple[list[int], bool]:
    """Exact backtrack on a device-ordered LinearGraph: first-strict-max
    with creation-key tie-break (== the reference walk, SPEC §2.6).

    Returns (path, ambiguous): `ambiguous` is True when a score tie
    involved a KEY_UNCERTAIN edge — the only case the creation keys
    cannot resolve — and the caller must use the exact host engine.
    """
    from pbdagcon_tpu.ops.linearize import edge_escores

    _F32 = np.float32
    full = np.empty(lin.n + 1, dtype=np.float32)
    full[: lin.n] = scores
    full[lin.n] = _F32(0.0)
    esc = edge_escores(lin, lin.edge_tgt, lin.edge_cnt)
    enter_esc = edge_escores(lin, lin.enter_tgt, lin.enter_cnt)

    def pick(
        tgt: np.ndarray, e_esc: np.ndarray, ekey: np.ndarray
    ) -> tuple[int, bool]:
        best = None
        best_w = -1
        best_key = None
        tie_unc = False
        for k in range(len(tgt)):
            cand = _F32(e_esc[k] + full[tgt[k]])
            kk = int(ekey[k])
            if best is None or cand > best:
                best = cand
                best_w = int(tgt[k])
                best_key = kk
                tie_unc = False
            elif cand == best:
                if (kk | best_key) & KEY_UNCERTAIN:
                    tie_unc = True
                if (kk & KEY_MASK) < (best_key & KEY_MASK):
                    best_w = int(tgt[k])
                    best_key = kk
        return best_w, tie_unc

    path: list[int] = []
    u, unc = pick(lin.enter_tgt, enter_esc, keys.enter_key)
    if unc:
        return path, True
    off = lin.edge_off
    while u >= 0 and u != lin.n:
        path.append(u)
        lo, hi = off[u], off[u + 1]
        u, unc = pick(
            lin.edge_tgt[lo:hi], esc[lo:hi], keys.edge_key[lo:hi]
        )
        if unc:
            return path, True
    return path, False
