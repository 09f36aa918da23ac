"""Device-side graph construction (JAX): the batched, fixed-shape
implementation of `ops/devbuild.py`'s order-free merged-graph build.

Everything here is jit-compatible tensor code — comparisons, cumulative
scans, `lax.sort`, gathers; **no device scatters** (they compile
pathologically on tunneled backends). The outputs are bit-identical to
the NumPy oracle (`tests/test_devbuild_jax.py` verifies array-for-array
equality), which in turn is differentially verified against the exact
host engine.

Pipeline (per batch of B targets, static caps in CAPS):
  1. decode: per-column target positions, coverage/match sums,
     matched-position tables (`mpos`), insertion-column compaction;
  2. chain extraction: one row per (read, inter-anchor segment) with
     packed reversed base strings, anchors, start/termination;
  3. backbone absorption (single pass, pre-sort): out-degree-1 backbone
     detection, absorbed chains re-terminate one column left with their
     last base stripped; cascade recheck -> per-target flag;
  4. suffix tries by sorting: `lax.sort` over (target, termination,
     reversed string), trie nodes from LCP runs, weights/anchors/
     survivor info from segment scans over runs;
  5. linearization: postorder trie placement + backbone interleave,
     banded edge/key materialization (one-hot accumulation, no
     scatter), long-edge register file, per-target overflow flags.

The result feeds the existing banded DP (`ops/dp.py`) and the device
backtrack (`ops/devemit.py`).

Reference: `AlnGraphBoost::addAln/mergeNodes` (src/cpp/AlnGraphBoost.cpp,
SURVEY.md §3.3 — reconstructed; mount empty). This is the north star's
"vectorized column-wise vote+merge kernel", built TPU-first.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from pbdagcon_tpu.ops.devbuild import (
    OP_DEL,
    OP_INS,
    OP_MATCH,
)
from pbdagcon_tpu.ops.mxu import (
    mxu_gather,
    mxu_hist,
    mxu_scatter,
)

I32 = jnp.int32

# Profiling-only ablation switches (tools/ablate_devbuild.py): each
# name replaces one suspect op with a shape/dtype-identical stand-in
# so the op's cost can be measured as a full-build delta WITH fusion
# intact (prefix-difference profiling mis-attributes tens of ms to
# materialization at stage boundaries). NEVER set in production — the
# stand-ins produce wrong values.
_ABLATE: frozenset = frozenset()


def _abl(name: str) -> bool:
    return name in _ABLATE


def _sort(name: str, operands, *, num_keys: int):
    """lax.sort with an ablation stand-in (returns operands unsorted —
    same shapes/dtypes/value ranges, wrong order)."""
    if _abl(name):
        return operands
    return jax.lax.sort(operands, dimension=-1, num_keys=num_keys)


def _hist(name: str, values, valid, D: int, **kw):
    """mxu_hist with an ablation stand-in (all-zero counts)."""
    if _abl(name):
        return jnp.zeros(values.shape[:-1] + (D,), I32)
    return mxu_hist(values, valid, D, **kw)


@dataclasses.dataclass(frozen=True)
class Caps:
    """Static shape caps for one compiled build. Targets exceeding any
    cap are flagged and fall back to the host engine."""

    B: int  # targets per batch
    R: int  # reads per target
    C: int  # columns per read
    L: int  # backbone length
    CH: int  # chains per read (inter-anchor segments with insertions)
    SM: int  # max chain length (inserted bases per segment)
    NC: int  # chains per target (global table)
    ND: int  # trie nodes per target
    SE: int  # start edges per source anchor
    DQ: int  # max transition span (q - p)
    V: int  # linear nodes per target
    W: int  # band width (successor window)
    K: int = 32  # long-edge register slots (linear span > W)


def _seg_start_from_boundary(boundary: jnp.ndarray) -> jnp.ndarray:
    """[N] bool (True at run starts) -> [N] i32 index of each element's
    run start (inclusive cummax of position at boundaries)."""
    idx = jnp.arange(boundary.shape[-1], dtype=I32)
    return jax.lax.cummax(jnp.where(boundary, idx, 0), axis=boundary.ndim - 1)


def decode_columns(ops, starts, caps: Caps):
    """Per-column decode: consumed target position, per-read consumed/
    matched prefix counts.

    ops: [B, R, C] u8; starts: [B, R] i32 (1-based; 0 = padding read).
    Returns dict of column/read tables.
    """
    consume = (ops == OP_MATCH) | (ops == OP_DEL)
    is_ins = ops == OP_INS
    ncons = jnp.cumsum(consume, axis=-1, dtype=I32)  # inclusive
    # tpos of column c: for M/D columns the consumed position; for I
    # columns the current anchor (position of last consumed, or start-1).
    tpos = starts[..., None] - 1 + ncons
    nm = jnp.cumsum(ops == OP_MATCH, axis=-1, dtype=I32)
    seg = nm - (ops == OP_MATCH)  # segment id of a column (nM before it)
    return {
        "consume": consume,
        "is_ins": is_ins,
        "tpos": tpos,
        "nm": nm,
        "seg": seg,
        "n_matches": nm[..., -1],
        "n_cols": jnp.sum(
            (ops != 0).astype(I32), axis=-1
        ),
        "ends": starts - 1 + ncons[..., -1],  # last consumed position
    }


def coverage_and_matches(ops, starts, dec, caps: Caps):
    """cov[b, p] / matches[b, p] for p in 1..L (index 0 unused).

    cov: interval histogram over read [start, end] spans (one [B, 2R]
    sort). matches: histogram of match-column target positions (one
    flat [B, R*C] sort). Replaces the old per-row argsort compaction +
    [B, R, C] grid gathers, which dominated the decode stage."""
    B, R, C, L = caps.B, caps.R, caps.C, caps.L
    HL = L + 2
    live = starts > 0
    # coverage: +1 at start, -1 at end+1, prefix-summed over p. Interval
    # endpoint counts are a histogram over the [start | end+HL] domain —
    # MXU one-hot counting (ops/mxu.py), no sort.
    ends1 = jnp.clip(dec["ends"] + 1, 0, HL - 1) + HL
    iv = jnp.concatenate([starts, ends1], axis=-1)
    c_iv = _hist(
        "cov_hist", iv, jnp.concatenate([live, live], axis=-1), 2 * HL,
        chunk=4096,
    )
    cov = jnp.cumsum(c_iv[:, :HL] - c_iv[:, HL:], axis=-1)

    # matches[b, p] = # match columns consuming p: a histogram of the
    # match columns' target positions (padding rows have no OP_MATCH).
    is_m = ops == OP_MATCH
    matches = _hist(
        "match_hist", dec["tpos"].reshape(B, R * C),
        is_m.reshape(B, R * C), HL, chunk=4096,
    )
    return cov, matches


def matched_positions(ops, dec, starts, Lr, caps: Caps):
    """Match tables in match-rank space, via one flat 2-operand sort.

    Returns (mpos, mchain, s0chain):
      mpos[b, r, j]   = target position of the j-th match of read r
                        (1-based; exit = Lr+1 beyond the last match);
      mchain[b, r, j] = the segment FOLLOWING match j holds >= 1
                        insertion (so it forms a chain);
      s0chain[b, r]   = the leading segment (before the first match)
                        holds an insertion.

    The sort keys form a per-read permutation of column slots (matches
    take slots 0..nmat-1 in column order, the other columns fill the
    rest), so sorted values land exactly at slot r*C + j — no argsort,
    no grid gathers. The follows-segment flag rides bit 15 of the value
    (tpos <= L+1 < 2^15): it is the run-OR of is_ins over [match col,
    next match col), computed by a two-sided segmented scan."""
    B, R, C = caps.B, caps.R, caps.C
    is_m = ops == OP_MATCH
    nm = dec["nm"]  # inclusive per-column match count
    nmat = dec["n_matches"][..., None]
    cgrid = jnp.arange(C, dtype=I32)[None, None, :]
    # any-insertion within the run from each match column (inclusive)
    # to the next match column (exclusive); runs also break at read
    # starts so the leading segment is its own run.
    bnd = (is_m | (cgrid == 0)).reshape(B, R * C)
    runor = (
        -_seg_run_min(
            -dec["is_ins"].astype(jnp.int8).reshape(B, R * C), bnd
        )
    ).reshape(B, R, C) > 0
    s0chain = runor[:, :, 0] & ~is_m[:, :, 0]
    slot = jnp.where(is_m, nm - 1, nmat + (cgrid - nm))
    rr = jnp.arange(R, dtype=I32)[None, :, None]
    key = (rr * C + slot).reshape(B, R * C)
    val = jnp.where(
        is_m, dec["tpos"] | (runor.astype(I32) << 15), 0
    ).reshape(B, R * C)
    if R * C < (1 << 16):  # u16 sort: half the traffic (val < 2^16)
        key = key.astype(jnp.uint16)
        val = val.astype(jnp.uint16)
    _sk, sv = _sort("mpos_sort", (key, val), num_keys=1)
    svg = sv.astype(I32).reshape(B, R, C)
    j = jnp.arange(C, dtype=I32)
    in_m = j[None, None, :] < dec["n_matches"][..., None]
    mpos = jnp.where(in_m, svg & 0x7FFF, Lr[:, None, None] + 1)
    mchain = in_m & (svg >> 15 > 0)
    return mpos, mchain, s0chain


def extract_chains(ops, starts, ins_base, dec, mpos, Lr, caps: Caps):
    """Chain table [B, R, CH]: per (read, segment-with-insertions).

    Fields: valid, p (start anchor; 0 = enter), t (termination; L+1 =
    exit), length m, packed reversed strings s0..s2 (u32 lanes, 4 bases
    each, zero-padded), anchors [SM] per depth (depth 1 = last base),
    read index, seq (global creation order), overflow flag.
    """
    B, R, C, CH, SM = caps.B, caps.R, caps.C, caps.CH, caps.SM
    NI = ins_base.shape[1]
    RC = R * C
    BIGK = jnp.int32(1 << 24)
    # All chain work happens in the COMPACT ins stream [B, NI] (the
    # stream ins_base already lives in: read-major, column order). The
    # padded [B, R, C] grid is touched only by one cumsum + one
    # searchsorted; every gather is output-sized (NI or R*CH), which on
    # this TPU is ~10x cheaper than gathering on the padded grid.
    flat_ins = dec["is_ins"].reshape(B, RC)
    cum = jnp.cumsum(flat_ins, axis=-1, dtype=I32)  # inclusive
    total = cum[:, -1]  # [B] total ins per target
    k = jnp.arange(NI, dtype=I32)
    # k-th insertion's flat (r, c) index plus its (seg, anchor), via one
    # 3-operand sort whose keys rank insertion columns 0..total-1 and
    # push the rest behind: sorted values land compacted in k order.
    # (The old binary-search + two follow-up gathers paid the
    # elementwise-gather rate three times.)
    fidx = jnp.broadcast_to(jnp.arange(RC, dtype=I32), (B, RC))
    if RC < (1 << 16):
        # u16 sort (half the traffic): real keys are the distinct ranks
        # 0..total-1; pads tie at 0xFFFF past slot `total` (masked by
        # valid_k). seg/tpos ride as separate u16 payloads.
        skey = jnp.where(
            flat_ins, (cum - 1).astype(jnp.uint16), jnp.uint16(0xFFFF)
        )
        _sk3, pos_s, seg_s, tp_s = _sort(
            "extract_sort",
            (skey, fidx.astype(jnp.uint16),
             dec["seg"].reshape(B, RC).astype(jnp.uint16),
             dec["tpos"].reshape(B, RC).astype(jnp.uint16)),
            num_keys=1,
        )
        valid_k = k[None, :] < total[:, None]
        posc = jnp.clip(pos_s[:, :NI].astype(I32), 0, RC - 1)
        r_of = posc // C
        seg_k = seg_s[:, :NI].astype(I32)
        anchor_k = tp_s[:, :NI].astype(I32)
    else:
        skey = jnp.where(flat_ins, cum - 1, RC + fidx)
        sa = (
            (dec["seg"] << 15) | dec["tpos"]
        ).reshape(B, RC)  # seg(<=C) @15 | tpos(15b)
        _sk3, pos_s, sa_s = _sort(
            "extract_sort", (skey, fidx, sa), num_keys=1
        )
        valid_k = k[None, :] < total[:, None]
        posc = jnp.clip(pos_s[:, :NI], 0, RC - 1)
        r_of = posc // C
        seg_k = sa_s[:, :NI] >> 15
        anchor_k = sa_s[:, :NI] & 0x7FFF
    base_k = ins_base  # by construction aligned with k

    # chain = run of equal (read, seg) in the compact stream.
    r_s = jnp.where(valid_k, r_of, R)
    seg_s = jnp.where(valid_k, seg_k, BIGK)
    newc = valid_k & jnp.concatenate(
        [
            jnp.ones((B, 1), dtype=bool),
            (r_s[:, 1:] != r_s[:, :-1]) | (seg_s[:, 1:] != seg_s[:, :-1]),
        ],
        axis=-1,
    )
    gch = jnp.cumsum(newc, axis=-1, dtype=I32) - 1  # global chain id
    gch_s = jnp.where(valid_k, gch, BIGK)

    # per-read chain counts from the global ids at read boundaries.
    rq = jnp.arange(R, dtype=I32)
    read_lo, read_hi = _row_ss_lr(r_s, jnp.broadcast_to(rq, (B, R)))
    has_ins = read_hi > read_lo
    first_g = jnp.take_along_axis(
        gch, jnp.clip(read_lo, 0, NI - 1), axis=-1
    )
    last_g = jnp.take_along_axis(
        gch, jnp.clip(read_hi - 1, 0, NI - 1), axis=-1
    )
    n_chains = jnp.where(has_ins, last_g - first_g + 1, 0)  # [B, R]

    # (r, ch) grid -> global chain id; boundaries by ONE searchsorted
    # (right(g) == left(g+1) on integer keys, so query g and g+1 in the
    # same call).
    ch = jnp.arange(CH, dtype=I32)
    chain_valid = ch[None, None, :] < n_chains[..., None]
    g_grid = first_g[..., None] + ch[None, None, :]  # [B, R, CH]
    g_q = jnp.where(chain_valid, g_grid, BIGK).reshape(B, R * CH)
    if _abl("chain_ss"):
        gq_c = jnp.clip(g_q, 0, NI)
        both = jnp.concatenate([gq_c, gq_c], axis=-1)
    else:
        # first/last stream positions per integer chain id: a histogram
        # over the chain-id domain + exclusive cumsum gives lo[g] =
        # #{gch < g}; right(g) == lo[g + 1], so one mxu_gather over the
        # [g | g+1] query pair serves both. Replaces the 16k-wide
        # searchsorted co-sort (whole-build ablation: ~25 ms -> ~2 ms).
        hg = mxu_hist(gch, valid_k, NI, chunk=4096)
        lo_t = jnp.cumsum(hg, axis=-1, dtype=I32) - hg
        lo_t = jnp.concatenate(
            [lo_t, jnp.sum(hg, axis=-1, keepdims=True)], axis=-1
        )  # lo[NI] = total valid rows
        q2 = jnp.concatenate(
            [jnp.clip(g_q, 0, NI), jnp.clip(g_q + 1, 0, NI)], axis=-1
        )
        both = mxu_gather(lo_t, q2, max_val=NI + 1)
    chain_first = both[:, : R * CH].reshape(B, R, CH)
    chain_len = jnp.where(
        chain_valid,
        both[:, R * CH :].reshape(B, R, CH) - chain_first,
        0,
    )
    cf = jnp.clip(chain_first, 0, NI - 1)
    chain_seg = jnp.where(
        chain_valid,
        mxu_gather(
            seg_k, cf.reshape(B, R * CH), max_val=1 << 15
        ).reshape(B, R, CH),
        0,
    )

    # p / t anchors from mpos: seg s -> p = s==0 ? 0 : mpos[s-1],
    # t = s < nmat ? mpos[s] : L+1. One packed gather serves both:
    # pair[j] = mpos[j](15b @15) | mpos[j-1](15b).
    nmat = dec["n_matches"]
    mprev = jnp.concatenate(
        [jnp.zeros((B, R, 1), I32), mpos[..., :-1]], axis=-1
    )
    # per-read pair table lookup, batched as (B*R) rows on the MXU.
    pairg = mxu_gather(
        ((mpos << 15) | mprev).reshape(B * R, C),
        jnp.clip(chain_seg, 0, C - 1).reshape(B * R, CH),
        max_val=1 << 30,
    ).reshape(B, R, CH)
    p_anchor = jnp.where(chain_seg == 0, 0, pairg & 0x7FFF)
    t_anchor = jnp.where(
        chain_seg < nmat[..., None], pairg >> 15, Lr[:, None, None] + 1
    )

    # packed reversed strings + per-depth anchors: depth d (1..SM) is
    # the d-th base from the END of the chain. Gathers stay in k-space.
    # Layout: DEPTH-MAJOR [B, SM, R, CH] with (R, CH) on the (sublane,
    # lane) tile — SM-minor layouts pad SM (8..20) up to 128 lanes, a
    # 6-16x physical blowup every consumer pays (measured: the strip
    # gathers alone cost ~0.5 s/batch in the old layout).
    d = jnp.arange(SM, dtype=I32)
    src_ok = (
        d[None, :, None, None] < chain_len[:, None, :, :]
    ) & chain_valid[:, None, :, :]
    # base (8b) and anchor (< 2^24) pack into one i32, and the packed
    # form stays canonical downstream (absorption strips it wholesale;
    # consumers unpack with &/>>). Depth d reads ba_k[last - d] —
    # consecutive descending addresses — so SM right-shifted copies of
    # the stream (pure slices) + ONE broadcast gather at the shared
    # per-chain index `last` replace the SM*R*CH-element elementwise
    # gather (the old single biggest gather of the build).
    ba_k = (anchor_k << 8) | base_k.astype(I32)
    sh = [ba_k]
    for d2 in range(1, SM):
        sh.append(
            jnp.concatenate(
                [jnp.zeros((B, d2), I32), ba_k[:, :-d2]], axis=-1
            )
        )
    ba_sh = jnp.stack(sh, axis=1)  # [B, SM, NI]; row d = ba_k[j - d]
    last = jnp.clip(
        (chain_first + chain_len - 1).reshape(B, R * CH), 0, NI - 1
    )
    ba = (
        jnp.broadcast_to(ba_sh[:, :, :1], (B, SM, R * CH)) + 0
        if _abl("extract_ba")
        else jnp.take_along_axis(ba_sh, last[:, None, :], axis=2)
    ).reshape(B, SM, R, CH)
    rev_ba = jnp.where(src_ok, ba, 0)
    overflow = chain_len > SM

    return {
        "overflow_any": (
            jnp.any(overflow & chain_valid, axis=(1, 2))
            | jnp.any(n_chains > CH, axis=-1)
        ),
        "valid": chain_valid,
        "p": p_anchor,
        "t": t_anchor,
        "seg": chain_seg,
        "len": jnp.minimum(chain_len, SM),
        "true_len": chain_len,
        # [B, SM, R, CH] packed (anchor << 8 | base), depth-major
        # (d=0 -> last base of the chain).
        "rev_ba": rev_ba,
        "n_chains": n_chains,
    }

# ---------------------------------------------------------------------------
# Transitions (chainless inter-anchor segments) and backbone absorption.
# ---------------------------------------------------------------------------


def _row_searchsorted(rows, queries, side="left"):
    """Batched searchsorted: rows [..., N] sorted, queries [..., Q].

    method='sort' (co-sorting) is ~4x faster than the default binary-
    search scan on this TPU (measured)."""
    fn = lambda row, q: jnp.searchsorted(row, q, side=side, method="sort")
    for _ in range(rows.ndim - 1):
        fn = jax.vmap(fn)
    return fn(rows, queries).astype(I32)


def _row_ss_lr(rows, queries):
    """(left, right) boundaries in ONE co-sort: for integer keys,
    right(k) == left(k+1), so querying [q, q+1] in a single call costs
    one row-sort instead of two (the row, not the queries, dominates
    when rows are wide)."""
    Q = queries.shape[-1]
    both = _row_searchsorted(
        rows, jnp.concatenate([queries, queries + 1], axis=-1), side="left"
    )
    return both[..., :Q], both[..., Q:]


def transitions_table(dec, mtab, chains, starts, Lr, caps: Caps):
    """Aggregate chainless anchor transitions.

    One sorted-histogram pass over (read, match-index) space: each match
    j of each read emits at most one event — an interior transition
    (p=mpos[j] -> mpos[j+1], when the following segment has no
    insertions), an exit transition (j is the last match), or an enter
    transition (the leading segment, keyed by the first match). Events
    pack into integer keys, one 2-operand sort orders them, and counts /
    min-read payloads come from run boundaries.

    Returns:
      count_pq [B, L+2, DQ]: interior transitions p -> p+dq (dq >= 1),
      rkey_pq  [B, L+2, DQ]: min creating read (BIG when none),
      exit_cnt/exit_rkey [B, L+2]: transitions p -> exit,
      enter_cnt/enter_rkey [B, L+2]: enter -> q (q == Lr+1 holds the
        all-deletion enter->exit transition),
      over_dq  [B]: some interior transition has dq > DQ.
    """
    B, R, C, DQ, L = caps.B, caps.R, caps.C, caps.DQ, caps.L
    BIG = jnp.int32(1 << 24)
    nmat = dec["n_matches"]
    live = starts > 0
    mpos, mchain, s0chain = mtab

    jgrid = jnp.arange(C, dtype=I32)[None, None, :]
    p_j = mpos  # [B, R, C]: p of match j
    nxt = jnp.concatenate(
        [mpos[..., 1:], jnp.full((B, R, 1), 0, I32)], axis=-1
    )
    is_match = (jgrid < nmat[..., None]) & live[..., None]
    is_last = (jgrid + 1) >= nmat[..., None]
    nxt = jnp.where(is_last, Lr[:, None, None] + 1, nxt)
    # following segment (j+1) has insertions? (precomputed run-OR flag
    # riding the mpos permutation sort — the old searchsorted + grid
    # gather formulation paid the elementwise-gather rate twice)
    contrib = is_match & ~mchain
    delta = nxt - p_j
    over_dq = jnp.any(contrib & ~is_last & (delta > DQ), axis=(1, 2))

    # Event keys: interior p*(DQ+2)+dq, exit p*(DQ+2)+DQ+1, enter
    # EOFF + q; invalid BIG.
    STRIDE = DQ + 2
    EOFF = jnp.int32((L + 2) * STRIDE)
    key = jnp.where(
        contrib & ~is_last & (delta >= 1) & (delta <= DQ),
        p_j * STRIDE + delta,
        jnp.where(contrib & is_last, p_j * STRIDE + DQ + 1, BIG),
    )
    # enter events: one per read (j-independent); place at lane 0.
    first_q = jnp.where(nmat > 0, mpos[..., 0], Lr[:, None] + 1)
    e_key = jnp.where(
        live & ~s0chain, EOFF + first_q, BIG
    )  # [B, R]
    keys = jnp.concatenate(
        [key.reshape(B, R * C), e_key], axis=-1
    )
    reads = jnp.concatenate(
        [
            jnp.broadcast_to(
                jnp.arange(R, dtype=I32)[None, :, None], (B, R, C)
            ).reshape(B, R * C),
            jnp.broadcast_to(jnp.arange(R, dtype=I32)[None, :], (B, R)),
        ],
        axis=-1,
    )
    # Event counts are a histogram over the regular key grid
    # [(p, dq 1..DQ+1)] ++ [EOFF + q] — MXU one-hot counting + one
    # cumsum replaces the old full-grid searchsorted co-sort; the counts
    # and the first-occurrence index (exclusive prefix) both read off
    # the reshaped histogram with pure slices.
    DKEY = (L + 2) * (STRIDE + 1)  # > EOFF + L + 1
    ev_valid = keys < BIG
    h = _hist("trans_hist", keys, ev_valid, DKEY, chunk=4096)

    eoff_py = (L + 2) * STRIDE

    def grid_parts(a):
        intr = a[:, :eoff_py].reshape(B, L + 2, STRIDE)
        return intr[..., 1 : DQ + 2], a[:, eoff_py : eoff_py + L + 2]

    cnt_i, cnt_e = grid_parts(h)
    cnt = jnp.concatenate([cnt_i.reshape(B, -1), cnt_e], axis=-1)
    if R <= 64 and jax.default_backend() == "tpu":
        # Min creating read per key WITHOUT the (key, read) sort and
        # its post-sort grid gather (~19 ms/batch at bench caps): the
        # (key, read) pairs are unique (per read, event keys strictly
        # increase in j), so the weighted histogram of 1 << read per
        # key is an exact read-bitmask (per-bin byte-plane sums are
        # sums of distinct bits), and min read = count-trailing-zeros.
        from pbdagcon_tpu.ops.mxu import mxu_weighted_hist

        if R <= 32:
            wbits = (
                jnp.left_shift(jnp.int32(1), reads),
            )
        else:
            wbits = (
                jnp.where(
                    reads < 32,
                    jnp.left_shift(jnp.int32(1), reads & 31), 0
                ),
                jnp.where(
                    reads >= 32,
                    jnp.left_shift(jnp.int32(1), reads & 31), 0
                ),
            )
        if _abl("trans_mask"):
            masks = tuple(
                jnp.zeros((B, DKEY), I32) + 1 for _ in wbits
            )
        else:
            masks = mxu_weighted_hist(keys, ev_valid, wbits, DKEY)

        def ctz(m):  # m != 0: position of lowest set bit
            return jax.lax.population_count((m & -m) - 1)

        if R <= 32:
            rk_full = ctz(masks[0])
        else:
            rk_full = jnp.where(
                masks[0] != 0, ctz(masks[0]), 32 + ctz(masks[1])
            )
        rkm_i, rkm_e = grid_parts(rk_full)
        rk_grid = jnp.concatenate([rkm_i.reshape(B, -1), rkm_e], -1)
        rkey = jnp.where(cnt > 0, rk_grid, BIG)
    else:
        # Wide-R / CPU fallback: run-head of the (key, read) sort.
        lo_full = jnp.cumsum(h, axis=-1, dtype=I32) - h  # exclusive
        if (L + 2) * STRIDE + (L + 2) < 0xFFFF and R < 0xFFFF:
            keys = jnp.minimum(keys, 0xFFFF).astype(jnp.uint16)
            reads = reads.astype(jnp.uint16)
        _sk, sr = jax.lax.sort((keys, reads), dimension=-1, num_keys=2)
        NT = sr.shape[1]
        lo_i, lo_e = grid_parts(lo_full)
        lo = jnp.concatenate([lo_i.reshape(B, -1), lo_e], axis=-1)
        rkey = jnp.where(
            cnt > 0,
            jnp.take_along_axis(sr, jnp.clip(lo, 0, NT - 1), axis=-1)
            .astype(I32),
            BIG,
        )
    ni = (L + 2) * (DQ + 1)
    cnt_i = cnt[:, :ni].reshape(B, L + 2, DQ + 1)
    rk_i = rkey[:, :ni].reshape(B, L + 2, DQ + 1)
    return {
        "count_pq": cnt_i[..., :DQ],
        "rkey_pq": rk_i[..., :DQ],
        "exit_cnt": cnt_i[..., DQ],
        "exit_rkey": rk_i[..., DQ],
        "enter_cnt": cnt[:, ni:],
        "enter_rkey": rkey[:, ni:],
        "over_dq": over_dq,
    }


def _presence_hist(values, valid, upper, caps_n):
    """values [B, N] (valid mask) -> count per value in [0, upper):
    MXU one-hot histogram (ops/mxu.py) — counting, not sorting."""
    return _hist("absorb_hists", values, valid, upper, chunk=4096)


def apply_absorption(chains, trans, bb, Lr, caps: Caps, _upto: int = 0):
    """Multi-round backbone absorption on the flat chain table,
    loop-free.

    Flattens the [B, R, CH] chain table to [B, N] (N = R*CH). Because
    out-degree-1 membership is static and absorption fires for any
    nonempty group, the number of cascade rounds a chain undergoes is
    chain-local: k = length of the leading-true prefix of
    ok_j = outdeg1[t-j] & (rev_base[j-1] == backbone[t-j-1]) & (j <= len)
    over j = 1..MAX_ABSORB_ROUNDS. The chain is then stripped k times in
    one shot (t -= k, drop k leading reversed bases, phase = k); a chain
    emptied at round k becomes a (p, t-k) transition with an uncertain
    phase-2 key. Chains whose prefix extends one round further flag the
    target (phase packs into 2 bits of the int32 sort keys downstream).

    Per-round side effects become interval histograms: the absorbed-
    count bonus is +1 on backbone [t-k, t-1], strip landings mark tries
    [t-k (+1 if died), t-1].

    Returns flat chain arrays + per-target extras.
    """
    B, R, CH, SM, L = caps.B, caps.R, caps.CH, caps.SM, caps.L
    N = R * CH

    def flat(x, shape=()):
        return x.reshape((B, N) + shape)

    valid = flat(chains["valid"])
    pf = flat(chains["p"])
    tf = flat(chains["t"])
    lenf = flat(chains["len"])
    ba = chains["rev_ba"].reshape(B, SM, N)  # packed, depth-major
    read = jnp.broadcast_to(
        jnp.arange(R, dtype=I32)[None, :, None], (B, R, CH)
    ).reshape(B, N)
    seq = jnp.arange(N, dtype=I32)[None, :].repeat(B, axis=0)

    # multi_out[p]: skip transitions (dq >= 2 or exit with p < Lr) or a
    # chain start at p.
    skip_any = jnp.sum(trans["count_pq"][..., 1:], axis=-1) > 0  # dq>=2
    exit_skip = (trans["exit_cnt"] > 0) & (
        jnp.arange(caps.L + 2, dtype=I32)[None, :] < Lr[:, None]
    )
    chain_start_cnt = _presence_hist(pf, valid, caps.L + 2, N)
    multi = skip_any | exit_skip | (chain_start_cnt > 0)
    pidx = jnp.arange(caps.L + 2, dtype=I32)[None, :]
    outdeg1 = (
        (pidx >= 1) & (pidx <= Lr[:, None]) & ~multi
    )  # [B, L+2]
    if _upto == 1:
        return {"outdeg1": outdeg1}

    # Rounds of absorption per chain (closed form, no loop): ok_j holds
    # iff round j would absorb the chain — the chain still exists
    # (j <= len), the round-j backbone node t-j is out-degree-1, and the
    # round-j last base rev_base[j-1] equals backbone[t-j-1]. kx = the
    # leading-true prefix length over j = 1..ABR; a prefix reaching
    # ABR+1 flags the target (phase must fit 2 bits downstream).
    from pbdagcon_tpu.ops.devbuild import MAX_ABSORB_ROUNDS as ABR

    J = ABR + 1  # probe one extra round for the flag
    assert SM >= J, "SM ladder must cover the absorption probe depth"
    jj = jnp.arange(1, J + 1, dtype=I32)  # [J]
    tj = tf[:, None, :] - jj[None, :, None]  # [B, J, N] pm at round j
    # 7-bit entries for rounds 1..J pack into one word per position:
    # ent(x) = outdeg1(x) | (bb[x-1] & 0x3F) << 1, word(p) holds
    # ent(p-1)..ent(p-J) -> ONE [B, N] gather at t instead of a
    # [B, J*N] one. The chars in play (ACGTN + the ^/$ sentinels) span
    # [36, 94] — pairwise diffs < 64 — so the 6-bit base comparison is
    # collision-free; entry 0 (not out-degree-1) fails bit 0 first.
    bbp = jnp.pad(bb.astype(I32), ((0, 0), (1, 1)))  # [B, L+2]
    ent = jnp.where(outdeg1, ((bbp & 0x3F) << 1) | 1, 0)
    word = jnp.zeros_like(ent)
    for j2 in range(1, J + 1):
        sh = jnp.concatenate(
            [jnp.zeros((B, j2), I32), ent[:, :-j2]], axis=-1
        )  # sh[p] = ent[p - j2]; p - j2 < 0 -> 0
        word = word | (sh << (7 * (j2 - 1)))
    # [B, N] lookup from the [B, L+2] word table: MXU one-hot gather
    # (~5x the hardware per-index gather rate at this shape).
    wt = mxu_gather(
        word, jnp.clip(tf, 0, caps.L + 1), max_val=1 << (7 * J)
    )
    ent_j = (wt[:, None, :] >> (7 * (jj[None, :, None] - 1))) & 0x7F
    ok = (
        valid[:, None, :]
        & (jj[None, :, None] <= lenf[:, None, :])
        & (tj >= 1)
        & ((ent_j & 1) == 1)
        & ((ent_j >> 1) == (ba[:, :J, :] & 0x3F))
    )
    pref = jnp.cumsum(jnp.where(ok, 0, 1), axis=1) == 0  # prefix-AND
    kx = jnp.sum(pref[:, :ABR, :].astype(I32), axis=1)  # [B, N] 0..ABR
    cascade = jnp.any(pref[:, J - 1, :], axis=-1)  # round ABR+1 fires
    if _upto == 2:
        return {"kx": kx, "cascade": cascade}

    HL = caps.L + 2

    # strip kx times in one shot: select among the ABR+1 constant
    # depth-shifts of the packed rev stream (pure elementwise — the old
    # per-element gather on an SM-minor layout was the single hottest
    # block of the whole build).
    ba2 = ba
    for k2 in range(1, ABR + 1):
        shifted = jnp.concatenate(
            [ba[:, k2:, :], jnp.zeros((B, k2, N), ba.dtype)], axis=1
        )
        ba2 = jnp.where(kx[:, None, :] == k2, shifted, ba2)
    len2 = lenf - kx
    t2 = tf - kx
    died = valid & (kx > 0) & (len2 == 0)
    valid2 = valid & ~died
    phase = kx  # strips sort after originals per t, by round
    if _upto == 3:
        return {"ba2": ba2, "died": died}

    # died chains become (p, t-kx) transitions with uncertain keys:
    # aggregate counts per (p, dq) and per-(p,dq) min read / orig t.
    DQ = caps.DQ
    pmN = jnp.clip(t2, 0, caps.L + 1)  # death column (= final t)
    dd = pmN - pf
    BIG = jnp.int32(1 << 24)
    # died counts per (p, dq) come from the single (p, dq)-keyed sort
    # below: run length = searchsorted(right) - searchsorted(left).
    # died strips spanning further than DQ become long-edge candidates
    # (p, pm) with uncertain keys: dedupe + count via one sort.
    K = caps.K
    dl_m = died & (dd > DQ)
    dl_key = jnp.where(dl_m, pf * (caps.L + 2) + pmN, jnp.int32(1 << 28))
    dl_rd = jnp.where(dl_m, read, jnp.int32(1 << 20))
    sdk, sdr = _sort("absorb_dl_sort", (dl_key, dl_rd), num_keys=2)
    dl_uniq = (sdk < (1 << 28)) & jnp.concatenate(
        [jnp.ones((B, 1), bool), sdk[:, 1:] != sdk[:, :-1]], axis=-1
    )
    posd = jnp.broadcast_to(jnp.arange(N, dtype=I32), (B, N))
    dl_nb = jnp.where(
        jnp.concatenate(
            [dl_uniq[:, 1:] | (sdk[:, 1:] >= (1 << 28)),
             jnp.ones((B, 1), bool)], axis=-1,
        ),
        posd + 1, jnp.int32(N),
    )
    dl_end = jnp.flip(
        jax.lax.cummin(jnp.flip(dl_nb, axis=-1), axis=1), axis=-1
    )
    # compact unique died-long edges to K slots (sort uniq-first).
    cu_key = jnp.where(dl_uniq, sdk, jnp.int32(1 << 28))
    cu_pos = posd
    cuk, cup = _sort("absorb_dl_sort", (cu_key, cu_pos), num_keys=2)
    died_long = {
        "p": jnp.where(cuk[:, :K] < (1 << 28), cuk[:, :K] // (caps.L + 2), -1),
        "q": jnp.where(cuk[:, :K] < (1 << 28), cuk[:, :K] % (caps.L + 2), -1),
        "cnt": jnp.take_along_axis(
            dl_end - posd, jnp.clip(cup[:, :K], 0, N - 1), axis=-1
        ),
        "rd": jnp.take_along_axis(
            sdr, jnp.clip(cup[:, :K], 0, N - 1), axis=-1
        ),
    }
    over_dd = jnp.sum(dl_uniq, axis=-1) > K
    if _upto == 4:
        return {"died_long": died_long, "over_dd": over_dd}

    # min (read, orig t) per (p, dq) for died chains via one sort:
    # key = p * (DQ+2) + dq, payload packed (read << 18 | orig t); the
    # first element of each sorted run is the minimum payload.
    KPAD = (caps.L + 2) * (DQ + 2) + 1
    s_pack = None
    if (
        KPAD < 0xFFFF
        and caps.R * (caps.L + 2) <= 0xFFFF
    ):
        # u16 sort, payload packed read*(L+2)+t into ONE u16 (t < L+2,
        # so numeric order == lexicographic (read, t) order): 2 sorted
        # operands instead of 3 — a third off this sort's traffic.
        dkey = jnp.where(
            died & (dd >= 1) & (dd <= DQ),
            (pf * (DQ + 2) + dd).astype(jnp.uint16),
            jnp.uint16(KPAD),
        )
        sk2, s_pack = _sort(
            "absorb_died_sort",
            (dkey,
             (read * (caps.L + 2) + tf).astype(jnp.uint16)),
            num_keys=2,
        )
    elif KPAD < 0xFFFF and caps.R < 0xFFFF and caps.L + 2 < 0xFFFF:
        # u16 sort (half traffic): min-(read, t) ordering preserved by
        # sorting the split payloads as secondary/tertiary keys.
        dkey = jnp.where(
            died & (dd >= 1) & (dd <= DQ),
            (pf * (DQ + 2) + dd).astype(jnp.uint16),
            jnp.uint16(KPAD),
        )
        sk2, s_rd, s_tf = jax.lax.sort(
            (dkey, read.astype(jnp.uint16), tf.astype(jnp.uint16)),
            dimension=-1, num_keys=3,
        )
    else:
        dkey = jnp.where(
            died & (dd >= 1) & (dd <= DQ),
            pf * (DQ + 2) + dd,
            jnp.int32(KPAD),
        )
        sk2, s_rd, s_tf = jax.lax.sort(
            (dkey, read, tf), dimension=-1, num_keys=3
        )
    # counts + first-occurrence index per (p, dq) key: MXU histogram
    # over the regular key grid + exclusive cumsum — pure slices, no
    # searchsorted co-sort.
    h2 = _hist(
        "absorb_hists", pf * (DQ + 2) + dd, died & (dd >= 1) & (dd <= DQ),
        (caps.L + 2) * (DQ + 2), chunk=4096,
    )
    lo2 = jnp.cumsum(h2, axis=-1, dtype=I32) - h2
    died_cnt_pq = (
        h2.reshape(B, caps.L + 2, DQ + 2)[..., 1 : DQ + 1]
    )
    fi = lo2.reshape(B, caps.L + 2, DQ + 2)[..., 1 : DQ + 1].reshape(B, -1)
    fic = jnp.clip(fi, 0, N - 1)
    kmatch = died_cnt_pq.reshape(B, -1) > 0
    if s_pack is not None:
        # one MXU gather of the packed payload, unpack after.
        g_pack = mxu_gather(s_pack, fic, max_val=1 << 16)
        g_rd = g_pack // (caps.L + 2)
        g_tf = g_pack % (caps.L + 2)
    else:
        g_rd = mxu_gather(
            s_rd.astype(I32) & 0xFFFF, fic, max_val=1 << 16
        )
        g_tf = mxu_gather(
            s_tf.astype(I32) & 0xFFFF, fic, max_val=1 << 16
        )
    died_read = jnp.where(kmatch, g_rd, BIG).reshape(B, caps.L + 2, DQ)
    died_t = jnp.where(kmatch, g_tf, 0).reshape(B, caps.L + 2, DQ)
    if _upto == 5:
        return {"died_cnt_pq": died_cnt_pq, "died_read": died_read,
                "died_t": died_t}

    # bonus (+1 per absorbed chain on backbone [t-kx, t-1]) and strip_t
    # (trie landings on [t-kx (+1 if died), t-1]): since kx <= ABR (3),
    # the interval [t-kx, t-1] is the round set {t-j : j = 1..kx}, so
    # both reduce to (t, kx, died)-class histograms — ONE co-sort of
    # combined keys [B, N + 8*HL] replaces the old four-endpoint-stream
    # sort ([B, 4N]) plus its wider searchsorted.
    assert 2 * ABR + 1 <= 7
    abs_any = valid & (kx > 0)
    cnt_key = _hist(
        "absorb_hists",
        jnp.clip(tf, 0, HL - 1) * 8 + 2 * kx + died.astype(I32),
        abs_any, 8 * HL, chunk=4096,
    ).reshape(B, HL, 8)
    csuf = jnp.cumsum(cnt_key[:, :, ::-1], axis=-1)[:, :, ::-1]
    bonus = jnp.zeros((B, HL), I32)
    strip_cnt = jnp.zeros((B, HL), I32)
    for j3 in range(1, ABR + 1):
        # rows with kx >= j3 mark backbone p = t - j3; strips exclude
        # the death landing (kx == j3, died).
        n_ge = csuf[:, :, 2 * j3]
        term_s = n_ge - cnt_key[:, :, 2 * j3 + 1]
        shift = lambda a: jnp.concatenate(
            [a[:, j3:], jnp.zeros((B, j3), I32)], axis=-1
        )
        bonus = bonus + shift(n_ge)
        strip_cnt = strip_cnt + shift(term_s)
    strip_t = strip_cnt > 0
    if _upto == 6:
        return {"bonus": bonus, "strip_t": strip_t}

    return {
        "valid": valid2,
        "p": pf,
        "t": t2,
        "len": len2,
        "rev_ba": ba2,  # [B, SM, N] packed, post-strip
        "read": read,
        "seq": seq,
        "phase": phase,
        "bonus": bonus,
        "died_cnt_pq": died_cnt_pq,
        "died_read": died_read,
        "died_t": died_t,
        "died_long": died_long,
        "over_dd": over_dd,
        "cascade": cascade,
        "strip_t": strip_t,
        "outdeg1": outdeg1,
    }

# ---------------------------------------------------------------------------
# Suffix tries by sorting.
# ---------------------------------------------------------------------------


def _seg_scan_min_fwd(values, start_flags):
    """Inclusive forward segmented min along axis -1: segments begin
    where start_flags is True."""
    def op(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, jnp.minimum(va, vb)), fa | fb

    v, _ = jax.lax.associative_scan(
        op, (values, start_flags), axis=-1
    )
    return v


def _seg_run_min(values, start_flags):
    """Full-run min broadcast to every member: forward prefix-min within
    the run combined with a backward suffix-min. Two scans, no gather
    (elementwise gathers run at ~0.1 Gelem/s on this backend — the
    scans fuse and are ~50x cheaper)."""
    fwd = _seg_scan_min_fwd(values, start_flags)
    end_flags = jnp.concatenate(
        [start_flags[..., 1:], jnp.ones_like(start_flags[..., :1])],
        axis=-1,
    )
    bwd = jnp.flip(
        _seg_scan_min_fwd(
            jnp.flip(values, axis=-1), jnp.flip(end_flags, axis=-1)
        ),
        axis=-1,
    )
    return jnp.minimum(fwd, bwd)


def _seg_hold_fwd(values, start_flags):
    """Broadcast each run's start value to every member (forward
    segmented hold scan)."""
    def op(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va), fa | fb

    v, _ = jax.lax.associative_scan(
        op, (values, start_flags), axis=-1
    )
    return v


def build_tries(fc, Lr, caps: Caps):
    """Suffix-trie construction from the flat chain table (post-
    absorption). Returns sorted-chain arrays and the per-(chain, depth)
    node grid: creation ids, run boundaries, weights, survivor info.
    """
    B = fc["valid"].shape[0]
    N = fc["valid"].shape[1]
    SM = caps.SM
    BIGT = jnp.int32(1 << 20)

    # pack reversed strings into big-endian u32 lanes (bases < 128;
    # zero-pad sorts before real bases, keeping prefix runs contiguous).
    ba_dm = fc["rev_ba"]  # [B, SM, N] packed depth-major
    rb = (ba_dm & 0xFF).astype(jnp.uint32)

    def lane(i0):
        parts = []
        for j in range(4):
            d = i0 + j
            parts.append(
                (rb[:, d, :] if d < SM else jnp.zeros_like(rb[:, 0, :]))
                << (24 - 8 * j)
            )
        return parts[0] | parts[1] | parts[2] | parts[3]

    lanes = [lane(i) for i in range(0, SM, 4)]
    tkey = jnp.where(fc["valid"], fc["t"], BIGT)
    idx = jnp.broadcast_to(jnp.arange(N, dtype=I32), (B, N))
    # Per-chain fields RIDE THE SORT as two packed u32 payloads instead
    # of being fetched with seven post-sort elementwise gathers (each
    # [B, N] gather costs ~8 ms on this part vs ~0.1 ms per extra
    # narrow sort operand):
    #   pay1 = valid(1) @30 | p(15) @15 | len(5) @10 | read(10)
    #   pay2 = phase(2) @2*SB | seq(SB) @SB | pos(SB), SB = index bits
    # (production caps enforce R*CH <= 2^14 — devpipe.ch_hard — so
    # SB is 14 there; SB = 15 covers the widest test caps.)
    SB = max(14, (N - 1).bit_length())
    assert caps.SM <= 31 and caps.R <= (1 << 10) and 2 * SB + 2 <= 32
    SMASK = (1 << SB) - 1
    pay1 = (
        (fc["valid"].astype(I32) << 30)
        | (fc["p"] << 15)
        | (fc["len"] << 10)
        | fc["read"]
    )
    pay2 = (
        (fc["phase"].astype(jnp.uint32) << (2 * SB))
        | (fc["seq"].astype(jnp.uint32) << SB)
        | idx.astype(jnp.uint32)
    )
    sorted_ops = _sort(
        "tries_sort",
        tuple([tkey] + [ln.astype(jnp.uint32) for ln in lanes]
              + [pay1, pay2]),
        num_keys=1 + len(lanes),
    )
    st, p1s, p2s = sorted_ops[0], sorted_ops[-2], sorted_ops[-1]
    sidx = (p2s & SMASK).astype(I32)

    def g2(a):  # [B, SM, N] depth-major, shared-index broadcast gather
        if _abl("tries_g2"):
            return a
        return jnp.take_along_axis(a, sidx[:, None, :], axis=2)

    s_ba = g2(ba_dm)  # sorted chains, [B, SM, N]
    s = {
        "t": st,
        "valid": (p1s >> 30) & 1 > 0,
        "p": (p1s >> 15) & 0x7FFF,
        "len": (p1s >> 10) & 0x1F,
        "read": p1s & 0x3FF,
        "phase": ((p2s >> (2 * SB)) & 3).astype(I32),
        "seq": ((p2s >> SB) & SMASK).astype(I32),
        "rev_ba": s_ba,
        # node-major flats (i * SM + d indexing) for the node-grid
        # consumers in linearize/assemble; one dense copy each.
        "rb_nm": (s_ba & 0xFF).transpose(0, 2, 1).reshape(B, N * SM),
    }

    # lcp with previous chain (same t, shared reversed prefix, both
    # long enough).
    prev = lambda a: jnp.concatenate(
        [jnp.zeros_like(a[..., :1]), a[..., :-1]], axis=-1
    )
    same_t = (s["t"] == prev(s["t"])) & prev(s["valid"]) & s["valid"]
    eq = same_t
    lcp = jnp.zeros((B, N), dtype=I32)
    s_rb = s_ba & 0xFF  # [B, SM, N]
    for d in range(1, SM + 1):
        eq = (
            eq
            & (s_rb[:, d - 1, :] == prev(s_rb[:, d - 1, :]))
            & (s["len"] >= d)
            & (prev(s["len"]) >= d)
        )
        lcp = jnp.where(eq, d, lcp)

    # node creation: chain i creates nodes at depths lcp+1..len.
    dgrid = jnp.arange(1, SM + 1, dtype=I32)[None, None, :]  # [1,1,SM]
    node_new = (
        s["valid"][..., None]
        & (dgrid <= s["len"][..., None])
        & (dgrid > lcp[..., None])
    )
    n_new = jnp.where(s["valid"], s["len"] - lcp, 0)
    base_id = jnp.cumsum(n_new, axis=-1, dtype=I32) - n_new  # exclusive
    n_nodes = jnp.sum(n_new, axis=-1)

    pos = jnp.broadcast_to(jnp.arange(N, dtype=I32), (B, N))
    seqpack = (s["phase"] << 14) | s["seq"]  # creation order of chains
    # segmented min of (phase, seq, pos): 32-bit packing —
    # phase(1b) | seq(14b) | pos(14b), fits int32 for N <= 16384.
    packed = (seqpack << 14) | pos
    zval = base_id - lcp  # nid = z[owner] + d - 1

    # All SM depths at once, DEPTH-MAJOR [B, SM, N] (the layout every
    # consumer wants), with the per-depth segmented scans replaced by
    # closed forms (the old loop ran 24 tuple-associative scans; the
    # whole-build ablation measured it at ~27 ms/batch — this block is
    # ~2 ms):
    #   - run-start hold (nid) = ONE cummax of (pos << 14 | zval):
    #     pos ascends, so the max IS the latest boundary's packed
    #     value (zval < 2^14 when the target fits ND; past-cap targets
    #     flag over_nd and fall back, so their garbage is never read);
    #   - the survivor min is only ever CONSUMED at run starts (i_r
    #     rows are node creators == run starts; a depth-d run's first
    #     chain has lcp < d, and any later member with len >= d would
    #     need lcp >= d — so creators are starts), where the full-run
    #     min equals the suffix min over [i, run_end): computed by
    #     log2(N) backward doubling passes bounded by run_end.
    dgrid2 = jnp.arange(1, SM + 1, dtype=I32)[None, :, None]
    posb = pos[:, None, :]
    bnd_dm = lcp[:, None, :] < dgrid2  # [B, SM, N] run starts
    owner_dm = jax.lax.cummax(jnp.where(bnd_dm, posb, 0), axis=2)
    nxt = jnp.where(bnd_dm, posb, N)
    rev_cummin = jnp.flip(
        jax.lax.cummin(jnp.flip(nxt, axis=-1), axis=2), axis=-1
    )
    # run_end[i] = first boundary strictly after i (N if none).
    run_end_dm = jnp.concatenate(
        [rev_cummin[..., 1:], jnp.full((B, SM, 1), N, dtype=I32)],
        axis=-1,
    )
    holdp = jax.lax.cummax(
        jnp.where(
            bnd_dm,
            (posb << 14) | jnp.minimum(zval, 0x3FFF)[:, None, :],
            -1,
        ),
        axis=2,
    )
    nid_dm = (holdp & 0x3FFF) + dgrid2 - 1
    weight_dm = run_end_dm - owner_dm
    # survivor suffix-min over [i, run_end) by backward doubling.
    sv = jnp.broadcast_to(packed[:, None, :], (B, SM, N))
    s_shift = 1
    while s_shift < N:
        shifted = jnp.concatenate(
            [sv[..., s_shift:],
             jnp.full((B, SM, s_shift), jnp.int32(1 << 30))],
            axis=-1,
        )
        sv = jnp.where(
            posb + s_shift < run_end_dm,
            jnp.minimum(sv, shifted), sv,
        )
        s_shift *= 2

    return {
        "sorted": s,
        "sidx": sidx,
        "lcp": lcp,
        "node_new": node_new,
        "n_nodes": n_nodes,
        # depth-major [B, SM, N]; run_end/weight/survivor are only
        # valid at run-start rows (the only rows consumers read).
        "owner": owner_dm,
        "run_end": run_end_dm,
        "nid": nid_dm,
        "weight": weight_dm,
        "survivor": sv,  # packed (seq, pos)
    }

# ---------------------------------------------------------------------------
# Linearization + banded edge/key materialization (gather-only).
# ---------------------------------------------------------------------------

NO_EDGE = jnp.int32(-1)


def _key_int(phase, gpre=0, rd=0):
    """Vectorized 32-bit creation key (devbuild.key_int semantics):
    (phase << 28) | (gpre << 14) | rd."""
    return (jnp.int32(phase) << 28) | (gpre << 14) | rd


KEY_UNCERTAIN = jnp.int32(1 << 30)


def linearize_and_band(
    tri, fc, absb, trans, cov, matches, bb, Lr, caps: Caps, _upto: int = 0
):
    """Assemble the banded linear graph on device.

    Returns dict with win/win_key [B,V,W], exit_cnt/exit_key [B,V],
    cov/unsup/weight/base/bbpos [B,V], n [B], enter tables, flags [B].
    """
    B, SM, ND, V, W, L = caps.B, caps.SM, caps.ND, caps.V, caps.W, caps.L
    SE, DQ = caps.SE, caps.DQ
    s = tri["sorted"]
    N = s["t"].shape[1]
    BIGT = jnp.int32(1 << 20)

    # ---- flat node list [B, N*SM] ------------------------------------
    # Node grid fields that are pure broadcasts of per-chain arrays
    # (t, depth, run-start) are NOT materialized/gathered: compact flat
    # indices decompose as i = idx // SM, d = idx % SM + 1, so those
    # fields are arithmetic on the index. Per-node gathers are composed
    # through ONE postordered index (gidx) instead of gsrc-then-greo
    # chains — elementwise gathers are the dominant cost on this
    # backend (~0.1 Gelem/s), so every avoided gather counts.
    # ---- direct rank-space compaction (no NF-wide sort, no gathers) --
    # A node's creation id EQUALS its compact row: nid(i, d) =
    # base_id[i] - lcp[i] + d - 1, and chain i's new nodes occupy the
    # consecutive ranks [base_id[i], base_id[i] + n_new[i]). So the
    # compact table is addressed arithmetically: scatter each creating
    # chain's (i, zval) to rank base_id[i] (unique-rank MXU scatter),
    # forward-fill, and decode i_r / d_r = rank - zval + 1 per row.
    # All per-(chain, depth) fields then arrive via ONE shared-index
    # broadcast gather over depth-major planes + an SM-way lane select
    # — replacing the old NF-wide compact sort plus four elementwise
    # [B, ND] gathers (~8 ms each on this part).
    lcp = tri["lcp"]
    n_new = jnp.where(s["valid"], s["len"] - lcp, 0)
    base_id = jnp.cumsum(n_new, axis=-1, dtype=I32) - n_new
    zval_c = base_id - lcp  # >= 0: the previous chain created >= lcp
    n_nodes = tri["n_nodes"]
    over_nd = n_nodes > ND
    i_arange = jnp.broadcast_to(jnp.arange(N, dtype=I32), (B, N))
    # The 14-bit zval field in the packed payload below is tied to this
    # assert: chains that land (base_id < ND) have zval_c = base_id -
    # lcp < ND <= 2^14, so zval never overflows into the i bits; chains
    # past ND carry corrupt payloads but are dropped by the rank >= D
    # filter inside mxu_scatter. Widening the ND ladder past 2^14
    # requires widening this packing in the same change.
    assert ND <= (1 << 14) and N <= (1 << 15)
    st_tbl = mxu_scatter(
        base_id, n_new > 0,
        (((i_arange << 14) | zval_c) + 1,), ND,
        max_payload=1 << 30,
    )[0]
    filled = _seg_hold_fwd(st_tbl, st_tbl > 0) - 1
    i_r = jnp.clip(filled >> 14, 0, N - 1)
    zval_r = filled & 0x3FFF
    rankg = jnp.broadcast_to(jnp.arange(ND, dtype=I32), (B, ND))
    comp_valid = rankg < n_nodes[:, None]
    cd = jnp.clip(rankg - zval_r + 1, 1, SM)

    if _upto == 1:
        return {"i_r": i_r, "cd": cd, "comp_valid": comp_valid}

    # tries fields arrive depth-major [B, SM, N] already.
    re_dm = tri["run_end"]
    w_dm = tri["weight"]
    sv_dm = (tri["survivor"] & ((1 << 14) - 1)).astype(I32)
    nid_dm = tri["nid"]
    rb_dm = s["rev_ba"] & 0xFF  # [B, SM, N]: depth-(d-1) base slot d-1
    pack_fld = N <= (1 << 14) and caps.R < (1 << 10)
    if pack_fld:
        # Ga = re(15) @17 | w(10) @7 | base(7); Gb = nid(14) @14 | sv(14)
        ga = (
            (re_dm.astype(jnp.uint32) << 17)
            | (jnp.clip(w_dm, 0, 0x3FF).astype(jnp.uint32) << 7)
            | (rb_dm & 0x7F).astype(jnp.uint32)
        )
        gb = (
            (nid_dm.astype(jnp.uint32) << 14)
            | sv_dm.astype(jnp.uint32)
        )
        planes = jnp.concatenate(
            [ga, gb, s["t"].astype(jnp.uint32)[:, None, :]], axis=1
        )
    else:
        planes = jnp.concatenate(
            [re_dm, w_dm, sv_dm, nid_dm, rb_dm.astype(I32),
             s["t"][:, None, :]], axis=1
        ).astype(jnp.uint32)
    gath = (
        planes[:, :, :ND]
        if _abl("linz_planes")
        else jnp.take_along_axis(planes, i_r[:, None, :], axis=2)
    )  # [B, P, ND] — shared-index broadcast gather (vectorized path)

    def dsel(off):
        """Select plane (off + cd - 1) per row: SM-way lane select."""
        out = gath[:, off, :]
        for d0 in range(2, SM + 1):
            out = jnp.where(cd == d0, gath[:, off + d0 - 1, :], out)
        return out

    if pack_fld:
        ga_sel = dsel(0)
        gb_prev = dsel(SM - 1)  # plane (cd - 2): depth d-1 (d >= 2)
        t_sel = gath[:, 2 * SM, :].astype(I32)
        cre = (ga_sel >> 17).astype(I32)
        cw = ((ga_sel >> 7) & 0x3FF).astype(I32)
        cbase = (ga_sel & 0x7F).astype(I32)
        csv = dsel(SM).astype(I32) & 0x3FFF
        cprev = (gb_prev >> 14).astype(I32) & 0x3FFF
    else:
        cre = dsel(0).astype(I32)
        cw = dsel(SM).astype(I32)
        csv = dsel(2 * SM).astype(I32)
        cprev = dsel(3 * SM - 1).astype(I32)  # nid at depth cd-1
        cbase = dsel(4 * SM).astype(I32) & 0x7F
        t_sel = gath[:, 5 * SM, :].astype(I32)

    ct = jnp.where(comp_valid, t_sel, BIGT)

    # postorder sort of the COMPACT table: (t, run_end, depth desc);
    # fields ride as three packed payloads (narrow sorts are cheap).
    #   P1 = i(15) @14 | rank(14); P2 = prev(14) @17 | w(10) @7 |
    #   base(7); P3 = survivor_pos(14)
    sorted_ = _sort(
        "linz_postorder",
        (
            ct, cre, SM - cd,
            (i_r << 14) | rankg,
            (jnp.clip(cprev, 0, 0x3FFF) << 17)
            | (jnp.clip(cw, 0, 0x3FF) << 7) | cbase,
            csv,
        ),
        num_keys=3,
    )
    st_t, nre, smcd, p1s, p2s, p3s = sorted_
    nvalid_t = st_t < BIGT
    nt = st_t
    nd_ = SM - smcd
    nrs = p1s >> 14  # creating chain (sorted-chain index)
    nnid = p1s & 0x3FFF  # nid == compact rank by construction
    prev_s = p2s >> 17
    nw = (p2s >> 7) & 0x3FF
    nbase = p2s & 0x7F
    csurv = p3s
    # parent nid (d >= 2): the depth-(d-1) node of the same chain run.
    npar = jnp.where(nd_ == 1, jnp.int32(-1), prev_s)
    jc = jnp.clip(csurv, 0, N - 1)
    # len(5b @25) | p(15b @10) | read(10b): p <= L+1 <= 16385 needs 15
    # bits at the top L rung; read < R <= 512. MXU one-hot gather
    # replaces the elementwise table fetch (~5x at this shape).
    sv_pack = (s["len"] << 25) | (s["p"] << 10) | s["read"]
    svw = mxu_gather(sv_pack, jc, max_val=1 << 30)
    nsvlen = svw >> 25
    nsvp = (svw >> 10) & ((1 << 15) - 1)
    nsvrd = svw & ((1 << 10) - 1)
    # anchor at (survivor chain, depth d-1): ONE shared-index broadcast
    # gather over the depth-major planes (the vectorized gather path)
    # + an SM-way lane select, instead of an elementwise N*SM fetch.
    ra_dm = s["rev_ba"] >> 8  # [B, SM, N]
    ga = (
        ra_dm[:, :, :ND]
        if _abl("linz_ra")
        else jnp.take_along_axis(ra_dm, jc[:, None, :], axis=2)
    )  # [B, SM, ND]
    nanch = jnp.zeros_like(nd_)
    for d0 in range(1, SM + 1):
        nanch = jnp.where(nd_ == d0, ga[:, d0 - 1, :], nanch)

    if _upto == 2:
        return {"nnid": nnid, "npar": npar, "nw": nw, "nbase": nbase,
                "svw": svw, "nanch": nanch}
    # linear index of trie node at table rank k: k + (t - 1).
    rank = jnp.broadcast_to(jnp.arange(ND, dtype=I32), (B, ND))
    lin_trie = jnp.where(nvalid_t, rank + nt - 1, jnp.int32(1 << 28))

    # nid -> lin map: nid is the compact creation id 0..n_nodes-1 (a
    # known rank), so the map is a unique-rank MXU scatter, not a sort.
    slin = mxu_scatter(nnid, nvalid_t, (rank + nt - 1,), ND)[0]

    def lin_of_nid(q):  # q [B, X] -> lin (invalid nids read 0)
        return mxu_gather(
            slin, jnp.clip(q, 0, ND - 1), max_val=1 << 16
        )

    # backbone linear index: p - 1 + (#nodes with t <= p) — an MXU
    # histogram of node t values + inclusive cumsum.
    pq = jnp.arange(L + 2, dtype=I32)
    ct_le = jnp.cumsum(
        _hist("linz_hist", nt, nvalid_t, L + 2), axis=-1, dtype=I32
    )
    lin_bb_full = pq[None, :] - 1 + ct_le  # valid for p in 1..Lr
    n_total = Lr + n_nodes
    over_v = n_total > V

    # preorder rank (t, run_start, depth asc) among valid nodes.
    pr_keys = (
        jnp.where(nvalid_t, nt, BIGT),
        nrs,
        nd_,
        rank,
    )
    _p1, _p2, _p3, pr_src = _sort("linz_preorder", pr_keys, num_keys=3)
    # pre_rank[row pr_src[j]] = j: pr_src is a permutation of 0..ND-1,
    # so the inverse is a unique-rank MXU scatter of j to rank pr_src.
    pre_rank = mxu_scatter(
        pr_src, jnp.ones_like(pr_src, bool),
        (jnp.broadcast_to(jnp.arange(ND, dtype=I32), (B, ND)),), ND,
    )[0]  # aligned with table rows

    if _upto == 3:
        return {"lin_bb_full": lin_bb_full, "pre_rank": pre_rank,
                "n_total": n_total}
    # parent lin per node: depth 1 -> backbone t (or exit), else via nid.
    # (+1 offset keeps the gathered table non-negative for the MXU
    # byte-split; lin_bb_full[0] is -1.)
    is_exit_parent = (nd_ == 1) & (nt == Lr[:, None] + 1)
    par_bb = mxu_gather(
        lin_bb_full + 1, jnp.clip(nt, 0, L + 1), max_val=1 << 16
    ) - 1
    par_lin = jnp.where(
        nd_ == 1, par_bb, lin_of_nid(jnp.clip(npar, 0, ND - 1))
    )
    span_trie = par_lin - lin_trie
    trie_span_over = nvalid_t & ~is_exit_parent & (
        (span_trie < 1) | (span_trie > W)
    )

    # ---- start edges --------------------------------------------------
    # one candidate per sorted chain that ends exactly at depth len:
    # deepest node nid_at(i, len) -> lin; dedupe by (p, node).
    clen = s["len"]
    cvalid = s["valid"] & (clen >= 1)
    # deepest node id per chain: select over the SM depth slices (dense
    # selects beat one elementwise gather by ~10x here).
    deep_nid = tri["nid"][:, 0, :]
    for d in range(2, SM + 1):
        deep_nid = jnp.where(clen == d, tri["nid"][:, d - 1, :], deep_nid)
    deep_lin = lin_of_nid(jnp.clip(deep_nid, 0, ND - 1))
    if _upto == 4:
        return {"par_lin": par_lin, "deep_lin": deep_lin}
    # u16 keys when p/node-lin fit (they do at every current rung):
    # halves the dominant operands' sort traffic; payload stays i32.
    se16 = (L + 2) * 2 + 2 < 0xFFFF and V + ND < 0xFFFE
    PBIG = 0xFFFF if se16 else (1 << 20)
    NBIG = 0xFFFF if se16 else (1 << 28)
    kdt = jnp.uint16 if se16 else I32
    se_key_p = jnp.where(
        cvalid, s["p"].astype(kdt), jnp.array(PBIG, kdt)
    )
    se_key_n = jnp.where(
        cvalid, deep_lin.astype(kdt), jnp.array(NBIG, kdt)
    )
    # payload: phase(1b) | read(13b) | sorted-chain index(14b), i32.
    se_pay = (
        (s["phase"] << 27)
        | (s["read"] << 14)
        | jnp.arange(N, dtype=I32)[None, :]
    )
    sp_, sn_, spay_ = _sort(
        "linz_se_sort", (se_key_p, se_key_n, se_pay), num_keys=3
    )
    se_invalid = sp_ >= PBIG
    sp_ = sp_.astype(I32)
    sn_ = sn_.astype(I32)
    # unique (p, node) runs: first row of each run.
    prev_same = (
        (sp_ == jnp.concatenate([sp_[:, :1] - 1, sp_[:, :-1]], axis=-1))
        & (sn_ == jnp.concatenate([sn_[:, :1] - 1, sn_[:, :-1]], axis=-1))
    )
    uniq = ~se_invalid & ~prev_same
    # run length (count) via next-boundary; the invalid tail is a
    # boundary too (runs must not extend into it).
    posn = jnp.broadcast_to(jnp.arange(N, dtype=I32), (B, N))
    nxt_is_bnd = jnp.concatenate(
        [uniq[:, 1:] | se_invalid[:, 1:], jnp.ones((B, 1), bool)],
        axis=-1,
    )
    nxtb = jnp.where(nxt_is_bnd, posn + 1, jnp.int32(N))
    run_end_se = jnp.flip(
        jax.lax.cummin(jnp.flip(nxtb, axis=-1), axis=1), axis=-1
    )
    se_count = run_end_se - posn  # valid at uniq rows
    # any-strip / min-read over the full run, broadcast to every member
    # by two-sided segmented scans (invalid rows are singleton runs so
    # valid runs never absorb the tail).
    se_bnd = uniq | se_invalid
    ph_sorted = spay_ >> 27
    se_anystrip = -_seg_run_min(-ph_sorted, se_bnd) > 0
    # min read among ALL contributing chains: the read rides bits 14..26
    # of the payload, so no gather is needed.
    rd_sorted = (spay_ >> 14) & ((1 << 13) - 1)
    se_minrd = _seg_run_min(rd_sorted, se_bnd)

    if _upto == 5:
        return {"uniq": uniq, "se_count": se_count,
                "se_anystrip": se_anystrip, "se_minrd": se_minrd}
    # node survivor info for the key phase decision: the two packed
    # field words are scattered into lin-indexed tables (unique-rank
    # MXU scatter over the ascending lin_trie) and fetched with ONE
    # gather each — no searchsorted co-sort.
    sn_clip = jnp.clip(jnp.where(uniq, sn_, 0), 0, V - 1)
    # w1: first-is-deep(1b @25) | svp(15b @10) | svrd(10b)
    w1 = (
        ((nsvlen == nd_).astype(I32) << 25) | (nsvp << 10) | nsvrd
    )
    # w2: uncertain-t(1b @29) | pre_rank(14b @15) | spare(15b); the
    # per-node strip_t flag is gathered once in table space ([B, ND])
    # and rides the packed word instead of a second [B, N] gather.
    unc_node = mxu_gather(
        absb["strip_t"].astype(I32), jnp.clip(nt, 0, L + 1), max_val=2
    )
    w2 = (unc_node.astype(I32) << 29) | (pre_rank << 15)
    w1_lin, w2_lin = mxu_scatter(
        lin_trie, nvalid_t, (w1, w2), V, max_payload=1 << 30,
    )
    g1 = mxu_gather(w1_lin, sn_clip, max_val=1 << 26)
    g2w = mxu_gather(w2_lin, sn_clip, max_val=1 << 30)
    nd_first_deep = g1 >> 25
    nd_first_p = (g1 >> 10) & ((1 << 15) - 1)
    nd_first_rd = g1 & ((1 << 10) - 1)
    nd_pre = (g2w >> 15) & ((1 << 14) - 1)
    nd_unc = (g2w >> 29) > 0
    threaded = (nd_first_deep == 1) & (nd_first_p == sp_)
    se_key = jnp.where(
        threaded,
        _key_int(1, rd=nd_first_rd),
        _key_int(2, gpre=nd_pre, rd=se_minrd)
        | jnp.where(
            nd_unc | se_anystrip, KEY_UNCERTAIN, jnp.int32(0)
        ),
    )
    return {
        "s": s,
        "node": {
            "t": nt, "d": nd_, "re": nre, "rs": nrs, "nid": nnid,
            "w": nw, "base": nbase, "anchor": nanch, "valid": nvalid_t,
            "lin": lin_trie, "par_lin": par_lin, "pre": pre_rank,
            "is_exit_parent": is_exit_parent,
        },
        "lin_bb_full": lin_bb_full,
        "n_total": n_total,
        "start_edges": {
            "p": sp_, "node_lin": sn_, "uniq": uniq, "count": se_count,
            "key": se_key,
        },
        "flags_partial": over_nd | over_v | jnp.any(trie_span_over, -1),
    }

# ---------------------------------------------------------------------------
# Band assembly + top-level build.
# ---------------------------------------------------------------------------


def assemble_band(
    linz, absb, trans, cov, matches, bb, Lr, caps: Caps, _upto: int = 0
):
    """Materialize win/exit/key bands and per-node arrays, [B, V]-shaped,
    by pure gathers (no scatter): every linear index classifies as a trie
    node or a backbone position; each edge class contributes a one-hot
    band lane."""
    B, V, W, L, SE, DQ = caps.B, caps.V, caps.W, caps.L, caps.SE, caps.DQ
    ND = caps.ND
    node = linz["node"]
    lin_bb_full = linz["lin_bb_full"]  # [B, L+2]
    n_total = linz["n_total"]
    v = jnp.arange(V, dtype=I32)
    vb = jnp.broadcast_to(v, (B, V))

    # ---- classify + field transport via ONE merged sort --------------
    # Trie linear indices (node["lin"]) and backbone linear indices
    # (lin_bb_full over valid p) are each ascending and together form a
    # permutation of 0..n_total-1, so sorting the union by lin places
    # every per-node field directly at its v slot — ONE multi-operand
    # sort replaces the two classify searchsorteds plus ~13 per-v
    # elementwise gathers (the dominant cost of this stage: elementwise
    # gathers run at ~0.1 Gelem/s on this part).
    assert 3 * caps.R < (1 << 14) and L + 1 < (1 << 15)
    parange = jnp.arange(L + 2, dtype=I32)[None, :]
    p_valid = (parange >= 1) & (parange <= Lr[:, None])
    BIGK = jnp.int32(1 << 28)
    bonus = absb["bonus"]
    w_bb_full = 1 + matches + bonus  # [B, L+2] backbone weights
    bbchar = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=bb.dtype), bb,
         jnp.zeros((B, 1), dtype=bb.dtype)], axis=-1
    )  # 1-based index
    ctor_p = (
        trans["count_pq"][..., 0] + absb["died_cnt_pq"][..., 0] + bonus
    )
    # exit count with the absorption bonus folded in at p == Lr (the
    # L->exit ctor edge); elsewhere it is the raw threaded exit count.
    xcnt_p = jnp.where(
        parange == Lr[:, None], trans["exit_cnt"] + bonus,
        trans["exit_cnt"],
    )
    xrd_p = jnp.clip(trans["exit_rkey"], 0, (1 << 14) - 1)
    nxt_lin_p = jnp.clip(
        jnp.concatenate(
            [lin_bb_full[:, 1:], lin_bb_full[:, L + 1 :]], axis=-1
        ),
        0, (1 << 18) - 1,
    )  # lin of p+1 (clip: values past Lr are only read masked)

    # trie-node base: the depth-(d-1) reversed base of the node's
    # run-start chain (equal across the run by construction).
    # trie-node base at (run-start chain, depth-1): shared-index
    # broadcast gather over the depth-major planes + SM-way select.
    rb_dm = linz["s"]["rev_ba"] & 0xFF  # [B, SM, N]
    gb = (
        rb_dm[:, :, :ND]
        if _abl("asm_base_gb")
        else jnp.take_along_axis(
            rb_dm,
            jnp.clip(node["rs"], 0, rb_dm.shape[2] - 1)[:, None, :],
            axis=2,
        )
    )  # [B, SM, ND]
    node_base_tbl = jnp.zeros_like(node["d"])
    for d0 in range(1, caps.SM + 1):
        node_base_tbl = jnp.where(
            node["d"] == d0, gb[:, d0 - 1, :], node_base_tbl
        )
    cov_anchor_nd = mxu_gather(
        cov, jnp.clip(node["anchor"], 0, L + 1), max_val=1 << 15
    )  # [B, ND]

    def pk(x, hi):  # defensive clamp before packing (pad rows only)
        return jnp.clip(x.astype(I32), 0, hi)

    # ---- p-space payload planes that RIDE the classify sort ----------
    # The variadic sort's cost is ~flat in operand count on this part
    # (measured 0.5 ms/op at 44 operands vs 0.7 at 5), so every per-p
    # field the band classes need transports to v-space as extra sort
    # payloads — replacing the per-plane broadcast gathers (dq: ~8 ms)
    # and the direct-to-v MXU scatter (SE: ~20 ms) of earlier rounds.

    # dq transition planes: packed (cnt | sel | rd) and shifted-lin
    # tables, pure slices in p-space.
    c1_all = trans["count_pq"]  # [B, L+2, DQ]
    c2_all = absb["died_cnt_pq"]
    sel_all = c1_all > 0
    rd_all = jnp.where(
        sel_all,
        jnp.clip(trans["rkey_pq"], 0, (1 << 14) - 1),
        jnp.clip(absb["died_read"], 0, (1 << 14) - 1),
    )
    packed_all = (
        (jnp.clip(c1_all + c2_all, 0, (1 << 14) - 1) << 15)
        | (sel_all.astype(I32) << 14)
        | rd_all
    )
    pa_t = jnp.moveaxis(packed_all, 2, 1)  # [B, DQ, L+2]

    def lin_shift(dq):  # lin_bb_full at min(p + dq, L + 1)
        return jnp.concatenate(
            [lin_bb_full[:, dq:],
             jnp.repeat(lin_bb_full[:, L + 1 :], dq, axis=1)],
            axis=-1,
        )

    qlin_all = jnp.stack(
        [lin_shift(dq) for dq in range(2, DQ + 1)], axis=1
    )  # [B, DQ-1, L+2]

    # SE start-edge slot tables in p-space: sort unique (p, node) rows
    # by (p, short-first), then one unique-rank MXU scatter places slot
    # si of p's run at rank si*(L+2) + p (si = position within the
    # ukey run, pure scans).
    se = linz["start_edges"]
    N = se["p"].shape[1]
    HLp = L + 2
    se_ulin = mxu_gather(
        lin_bb_full + 1, jnp.clip(se["p"], 0, L + 1), max_val=1 << 16
    ) - 1
    se_ulin = jnp.where(se["p"] == 0, -1, se_ulin)  # enter rows
    se_span = se["node_lin"] - se_ulin
    se_islong = se["uniq"] & (se["p"] >= 1) & (se_span > W)
    su16 = 2 * (L + 2) + 2 < 0xFFFF and N < 0xFFFF
    udt = jnp.uint16 if su16 else I32
    ukey = jnp.where(
        se["uniq"],
        (se["p"] * 2 + se_islong.astype(I32)).astype(udt),
        jnp.array(0xFFFF if su16 else (1 << 21), udt),
    )
    upos = jnp.broadcast_to(jnp.arange(N, dtype=udt), (B, N))
    su_key, _su_pos, su_n, su_c, su_k = _sort(
        "asm_su_sort",
        (ukey, upos, se["node_lin"], se["count"], se["key"]),
        num_keys=2,
    )
    # node_lin (< 2^17) and count (< 2^14) pack into one i32 plane.
    su_nc = (su_n << 14) | su_c
    posn2 = jnp.broadcast_to(jnp.arange(N, dtype=I32), (B, N))
    suk_i = su_key.astype(I32)
    run_st = jnp.concatenate(
        [jnp.ones((B, 1), bool), suk_i[:, 1:] != suk_i[:, :-1]], axis=-1
    )
    si_of = posn2 - _seg_start_from_boundary(run_st)
    BIGU = 0xFFFF if su16 else (1 << 21)
    # short real rows: key = 2p, p >= 1 (key 0 = enter rows; odd = long)
    sl_ok = (suk_i < BIGU) & (suk_i % 2 == 0) & (suk_i >= 2) & (
        si_of < SE
    )
    if _abl("asm_se_scatter"):
        t_nc = jnp.zeros((B, SE * HLp), I32) + su_nc[:, :1]
        t_k = jnp.zeros((B, SE * HLp), I32) + su_k[:, :1]
    else:
        t_nc, t_k = mxu_scatter(
            si_of * HLp + jnp.clip(suk_i // 2, 0, HLp - 1), sl_ok,
            (su_nc, su_k), SE * HLp, chunk=N, max_payload=1 << 31,
        )
    t_nc = t_nc.reshape(B, SE, HLp)
    t_k = t_k.reshape(B, SE, HLp)

    # Operand layouts (tag bit disambiguates row kind):
    #   M1 = tag(1)<<24 | p(15)<<9 | isx(1)<<8 | base(8)
    #   M2 = weight(<=2^11)<<15 | cov(<=2^10)
    #   M3 = trie: par_lin ; bb: xcnt(14)<<14 | ctor(14)
    #   M4 = bb: nxt_lin(18)<<14 | xrd(14) ; trie: 0
    m1_t = (
        jnp.int32(1 << 24)
        | (node["is_exit_parent"].astype(I32) << 8)
        | pk(node_base_tbl, 0xFF)
    )
    m1_b = (parange << 9) | bbchar.astype(I32)
    m2_t = (pk(node["w"], 0x7FFF) << 15) | pk(cov_anchor_nd, 0x7FFF)
    m2_b = (pk(w_bb_full, 0x7FFF) << 15) | pk(cov, 0x7FFF)
    m3_t = pk(node["par_lin"], (1 << 28) - 1)
    m3_b = (pk(xcnt_p, (1 << 14) - 1) << 14) | pk(ctor_p, (1 << 14) - 1)
    m4_t = jnp.zeros((B, ND), I32)
    m4_b = (nxt_lin_p << 14) | xrd_p

    key_t = node["lin"]  # pad rows already 1 << 28
    key_b = jnp.where(p_valid, lin_bb_full, BIGK)

    def cat(a, b, padval=0):
        x = jnp.concatenate([a, b], axis=-1)
        if x.shape[1] < V:  # pad the union up to V columns
            pad = jnp.full((B, V - x.shape[1]), jnp.int32(padval))
            return jnp.concatenate([x, pad], axis=-1)
        return x

    _sk, s1, s2, s3, s4 = _sort(
        "asm_sort",
        (cat(key_t, key_b, padval=1 << 28), cat(m1_t, m1_b),
         cat(m2_t, m2_b), cat(m3_t, m3_b), cat(m4_t, m4_b)),
        num_keys=1,
    )
    s1, s2, s3, s4 = s1[:, :V], s2[:, :V], s3[:, :V], s4[:, :V]

    in_range = vb < n_total[:, None]
    tag = (s1 >> 24) & 1
    is_trie = in_range & (tag == 1)
    is_bb = in_range & (tag == 0)
    pic = jnp.where(is_bb, (s1 >> 9) & 0x7FFF, 0)

    # p-space -> v-space transport of ALL band-class planes (dq
    # transitions + SE start-edge slots) in ONE shared-index multi-
    # plane MXU gather at pic: the one-hots are built once and every
    # byte-plane rides one lane-concatenated matmul (mxu_gather_planes)
    # — replacing the per-plane broadcast gathers (~8 ms) and the
    # direct-to-v rank scatter (~16-20 ms); riding them as extra sort
    # operands is off the table (the remote AOT compiler's sort
    # lowering is ~quadratic in operand count: 13 operands = 55 s).
    from pbdagcon_tpu.ops.mxu import mxu_gather_planes

    plane_in = (
        [(qlin_all[:, i, :], 3) for i in range(DQ - 1)]
        + [(pa_t[:, i, :], 4) for i in range(1, DQ)]
        + [(t_nc[:, si, :], 4) for si in range(SE)]
        + [(t_k[:, si, :], 4) for si in range(SE)]
    )
    pv = mxu_gather_planes(plane_in, pic)
    qlin_v_l = pv[: DQ - 1]
    pk_v_l = pv[DQ - 1 : 2 * (DQ - 1)]
    se_nc_l = pv[2 * (DQ - 1) : 2 * (DQ - 1) + SE]
    se_k_l = pv[2 * (DQ - 1) + SE :]
    if _upto == 1:
        return {"is_trie": is_trie, "is_bb": is_bb, "in_range": in_range}

    # ---- per-node arrays (unpacked from the sorted operands) ----------
    base = (s1 & 0xFF).astype(jnp.uint8)
    weight = s2 >> 15
    cov_lin = s2 & 0x7FFF
    bbpos = jnp.where(is_bb, pic, 0)
    unsup = is_bb & (weight == 1)
    if _upto == 2:
        return {"base": base, "weight": weight, "bbpos": bbpos,
                "cov_lin": cov_lin, "unsup": unsup}

    # ---- band classes -------------------------------------------------
    # Accumulated in [B, W, V] layout — V on the minor (lane) dimension
    # keeps the per-class select chains lane-parallel and lets XLA fuse
    # them into one pass (measured 500x over [B, V, W] accumulation);
    # one transpose at the end restores the DP's layout.
    NEG = jnp.int32(-1)
    # Edge counts fit int16 (<= reads per target << 2^14): the band is
    # the largest array family in the build, so halving its width halves
    # the traffic of the class-select chain, the final transpose, and
    # the DP's input.
    win = jnp.full((B, W, V), jnp.int16(-1))
    wkey = jnp.zeros((B, W, V), dtype=I32)
    exit_cnt = jnp.full((B, V), NEG)
    exit_key = jnp.zeros((B, V), dtype=I32)
    flags = jnp.zeros((B,), dtype=bool)
    wlane = jnp.arange(W, dtype=I32)[None, :, None]

    def add_class(win, wkey, flags, present, span, count, key):
        """present/span/count/key: [B, V]; span 1..: lane = span-1."""
        ok = present & (span >= 1) & (span <= W) & in_range
        flags = flags | jnp.any(present & (span > W) & in_range, axis=-1)
        if _abl("asm_band"):
            return win, wkey, flags
        m = ok[:, None, :] & (wlane == (span[:, None, :] - 1))
        win = jnp.where(m, count.astype(jnp.int16)[:, None, :], win)
        wkey = jnp.where(m, key[:, None, :], wkey)
        return win, wkey, flags

    # trie: single out-edge to parent (exit parents -> exit lane).
    t_par = s3  # par_lin rides M3 on trie rows
    t_isx = is_trie & (((s1 >> 8) & 1) == 1)
    win, wkey, flags = add_class(
        win, wkey, flags,
        is_trie & ~t_isx, t_par - vb, weight, jnp.zeros_like(vb),
    )
    exit_cnt = jnp.where(t_isx, weight, exit_cnt)

    # backbone ctor edge p -> p+1 (or exit at p == Lr).
    nxt_lin = s4 >> 14
    ctor_cnt = s3 & ((1 << 14) - 1)
    at_L = pic == Lr[:, None]
    win, wkey, flags = add_class(
        win, wkey, flags,
        is_bb & ~at_L, nxt_lin - vb, ctor_cnt, jnp.zeros_like(vb),
    )
    # Per-target hard band requirement: the max span of the two classes
    # that MUST fit the band (trie-parent and ctor edges — everything
    # else routes long spans to the K file). The pipeline adapts the W
    # rung of FUTURE batches from this, so the band stays as narrow as
    # the workload actually needs; undersized picks only flag.
    def _maxspan(present, span):
        return jnp.max(
            jnp.where(present & in_range & (span >= 1), span, 0),
            axis=-1,
        )

    wneed = jnp.maximum(
        _maxspan(is_trie & ~t_isx, t_par - vb),
        _maxspan(is_bb & ~at_L, nxt_lin - vb),
    )
    # exit edges: ctor at p == Lr (count = exit transitions + absorption
    # bonus, folded in p-space before the sort), else threaded exit
    # transitions when present.
    xcnt = (s3 >> 14) & ((1 << 14) - 1)
    xkey = _key_int(1, rd=s4 & ((1 << 14) - 1))
    exit_cnt = jnp.where(is_bb & at_L, xcnt, exit_cnt)
    exit_cnt = jnp.where(is_bb & ~at_L & (xcnt > 0), xcnt, exit_cnt)
    exit_key = jnp.where(
        is_bb & ~at_L & (xcnt > 0), xkey, exit_key
    )
    if _upto == 3:
        return {"win": win, "wkey": wkey, "flags": flags,
                "exit_cnt": exit_cnt, "exit_key": exit_key}

    # transitions dq = 2..DQ: short spans to the band, long spans (the
    # linear gap includes interposed tries) to the K-register file.
    pgrid = jnp.arange(L + 2, dtype=I32)[None, :]
    lk_u, lk_w, lk_cnt, lk_key, lk_long, lk_esc = [], [], [], [], [], []

    def bb_esc(cnt, q):
        """Edge score into backbone position q [B, X]."""
        qq = jnp.clip(q, 0, L + 1)
        uns = jnp.take_along_axis(w_bb_full, qq, axis=-1) == 1
        cq = jnp.take_along_axis(cov, qq, axis=-1)
        return jnp.where(
            uns, jnp.float32(-10.0),
            cnt.astype(jnp.float32) - 0.5 * cq.astype(jnp.float32),
        )

    def tbl_shift(a, dq):  # a[:, min(p + dq, L + 1)] via pure slices
        return jnp.concatenate(
            [a[:, dq:], jnp.repeat(a[:, L + 1 :], dq, axis=1)], axis=-1
        )

    def bb_esc_dq(cnt, dq):
        """bb_esc at the shifted grid q = p + dq: pure slices, no
        gather (the grid is regular)."""
        uns = tbl_shift(w_bb_full, dq) == 1
        cq = tbl_shift(cov, dq)
        return jnp.where(
            uns, jnp.float32(-10.0),
            cnt.astype(jnp.float32) - 0.5 * cq.astype(jnp.float32),
        )

    # The per-dq (count, key) fields rode the classify sort as packed
    # p-space planes (see extras_b above); the loop body is dense
    # slicing only.
    for dq in range(2, DQ + 1):
        qlin = qlin_v_l[dq - 2]
        pk = pk_v_l[dq - 2]
        c12 = pk >> 15
        rd = pk & ((1 << 14) - 1)
        key = jnp.where(
            (pk >> 14) & 1 == 1,
            _key_int(1, rd=rd),
            _key_int(2, rd=rd) | KEY_UNCERTAIN,
        )
        ok = is_bb & (pic + dq <= Lr[:, None]) & (c12 > 0)
        span = qlin - vb
        win, wkey, flags = add_class(
            win, wkey, flags, ok & (span <= W), span, c12, key,
        )
        # long candidates in (p, dq) space (smaller than per-v).
        qlin_p = lin_shift(dq)  # lin at min(p + dq, L + 1), pure slices
        c1p = trans["count_pq"][..., dq - 1]
        c2p = absb["died_cnt_pq"][..., dq - 1]
        okp = (
            (pgrid >= 1)
            & (pgrid + dq <= Lr[:, None])
            & ((c1p + c2p) > 0)
        )
        k1p = _key_int(
            1, rd=jnp.clip(trans["rkey_pq"][..., dq - 1], 0, (1 << 14) - 1)
        )
        k2p = _key_int(
            2, rd=jnp.clip(absb["died_read"][..., dq - 1], 0,
                           (1 << 14) - 1)
        ) | KEY_UNCERTAIN
        lk_u.append(lin_bb_full)
        lk_w.append(qlin_p)
        lk_cnt.append(jnp.where(okp, c1p + c2p, 0))
        lk_key.append(jnp.where(c1p > 0, k1p, k2p))
        lk_long.append(okp & ((qlin_p - lin_bb_full) > W))
        lk_esc.append(bb_esc_dq(c1p + c2p, dq))

    if _upto == 4:
        return {"win": win, "wkey": wkey, "flags": flags}
    # died strips with dd > DQ are always K candidates.
    dl = absb["died_long"]
    dl_ok = dl["p"] >= 0
    dl_u = jnp.take_along_axis(
        lin_bb_full, jnp.clip(dl["p"], 0, L + 1), axis=-1
    )
    dl_w = jnp.take_along_axis(
        lin_bb_full, jnp.clip(dl["q"], 0, L + 1), axis=-1
    )
    dl_key = _key_int(
        2, rd=jnp.clip(dl["rd"], 0, (1 << 14) - 1)
    ) | KEY_UNCERTAIN
    lk_u.append(dl_u)
    lk_w.append(dl_w)
    lk_cnt.append(jnp.where(dl_ok, dl["cnt"], 0))
    lk_key.append(dl_key)
    lk_long.append(dl_ok)
    lk_esc.append(bb_esc(dl["cnt"], dl["q"]))

    # start edges: the per-slot (node|cnt, key) planes rode the
    # classify sort (built p-space before it — see extras_b above).
    # SE-overflow flag from the run-count histogram.
    p_real = (
        (jnp.arange(HLp, dtype=I32)[None, :] >= 1)
        & (jnp.arange(HLp, dtype=I32)[None, :] <= Lr[:, None])
    )
    h_se = _hist(
        "asm_hse", se["p"] * 2 + se_islong.astype(I32), se["uniq"],
        2 * HLp, chunk=4096,
    )
    flags = flags | jnp.any(p_real & (h_se[:, 0::2] > SE), axis=-1)
    if _upto == 41:
        return {"nc_v": se_nc_l, "k_v": se_k_l, "win": win,
                "wkey": wkey}
    for si in range(SE):
        nc = se_nc_l[si]
        # an empty slot reads 0; real rows have count >= 1, so nc != 0
        # is exactly slot-occupied.
        tgt = (nc >> 14).astype(I32)
        cnt = (nc & ((1 << 14) - 1)).astype(I32)
        win, wkey, flags = add_class(
            win, wkey, flags, is_bb & (nc != 0), tgt - vb, cnt,
            se_k_l[si],
        )
    if _upto == 5:
        return {"win": win, "wkey": wkey, "flags": flags}
    # long start edges -> K candidates; esc uses the target trie node's
    # coverage(anchor) (trie nodes are never unsupported-backbone).
    # anchors scattered into lin-indexed space (unique-rank MXU
    # scatter) and fetched with one gather — no searchsorted co-sort.
    anch_lin = mxu_scatter(
        linz["node"]["lin"], linz["node"]["valid"],
        (linz["node"]["anchor"],), V,
    )[0]
    se_anch = jnp.where(
        se_islong,
        mxu_gather(
            anch_lin, jnp.clip(se["node_lin"], 0, V - 1),
            max_val=1 << 15,
        ),
        0,
    )
    se_cov = jnp.take_along_axis(
        cov, jnp.clip(se_anch, 0, L + 1), axis=-1
    )
    lk_u.append(jnp.where(se_islong, se_ulin, -1))
    lk_w.append(se["node_lin"])
    lk_cnt.append(jnp.where(se_islong, se["count"], 0))
    lk_key.append(se["key"])
    lk_long.append(se_islong)
    lk_esc.append(
        se["count"].astype(jnp.float32)
        - 0.5 * se_cov.astype(jnp.float32)
    )

    # compact long candidates to K slots per target.
    K = caps.K
    cu = jnp.concatenate(lk_u, axis=-1)
    cw = jnp.concatenate(lk_w, axis=-1)
    cc = jnp.concatenate(lk_cnt, axis=-1)
    ck = jnp.concatenate(lk_key, axis=-1)
    ce = jnp.concatenate(lk_esc, axis=-1)
    cl = jnp.concatenate(lk_long, axis=-1) & (cc > 0)
    NLC = cu.shape[1]
    # stable compaction with known ranks (running count of long rows):
    # a unique-rank MXU scatter of the source positions, not a sort.
    lrank = jnp.cumsum(cl, axis=-1, dtype=I32) - 1
    sp_k = mxu_scatter(
        lrank, cl,
        (jnp.broadcast_to(jnp.arange(NLC, dtype=I32), (B, NLC)),), K,
        max_payload=1 << 24,
    )[0]
    n_long = jnp.sum(cl, axis=-1)
    flags = flags | (n_long > K)

    def takeK(a):
        return jnp.take_along_axis(
            a, jnp.clip(sp_k, 0, NLC - 1), axis=-1
        )

    k_live = (
        jnp.arange(K, dtype=I32)[None, :] < jnp.minimum(n_long, K)[:, None]
    )
    long_u = jnp.where(k_live, takeK(cu), -1)
    long_w = jnp.where(k_live, takeK(cw), -1)
    long_cnt = jnp.where(k_live, takeK(cc), 0)
    long_key = jnp.where(k_live, takeK(ck), 0)
    long_esc = jnp.where(
        k_live, takeK(ce), jnp.float32(np.finfo(np.float32).min)
    )

    if _upto == 6:
        return {"win": win, "wkey": wkey, "flags": flags,
                "long_u": long_u, "long_esc": long_esc}
    # ---- enter tables -------------------------------------------------
    # candidates: ctor (q=1 / exit if Lr==0), transitions q, exit, and
    # enter start edges. Evaluated directly by the backtrack's first
    # pick: tgt [B, L+2+SE], cnt, key (tgt == n_total -> virtual exit).
    q = jnp.arange(L + 2, dtype=I32)[None, :]
    e_tgt_bb = jnp.where(
        q <= Lr[:, None], lin_bb_full, n_total[:, None]
    )
    e_tgt_bb = jnp.where(
        q == Lr[:, None] + 1, n_total[:, None], e_tgt_bb
    )
    e_cnt = trans["enter_cnt"]
    e_key = _key_int(
        1, rd=jnp.clip(trans["enter_rkey"], 0, (1 << 14) - 1)
    )
    # ctor enter->1 always present (count may be 0), key 0.
    e_present = (e_cnt > 0) | (q == 1)
    e_present = e_present & (q >= 1) & (q <= Lr[:, None] + 1)
    e_key = jnp.where(q == 1, 0, e_key)
    # enter start edges: p == 0 rows (ukey == 0; never routed to K) —
    # run bounds read off the ukey histogram.
    lo0 = jnp.zeros((B,), I32)
    hi0 = h_se[:, 0]
    flags = flags | (hi0 - lo0 > SE)
    es_tgt, es_cnt, es_key, es_ok = [], [], [], []
    for si in range(SE):
        j = jnp.clip(lo0 + si, 0, N - 1)[:, None]
        ok = (lo0 + si < hi0)[:, None]
        es_ok.append(ok)
        es_tgt.append(jnp.take_along_axis(su_n, j, axis=-1))
        es_cnt.append(jnp.take_along_axis(su_c, j, axis=-1))
        es_key.append(jnp.take_along_axis(su_k, j, axis=-1))
    enter = {
        "tgt": jnp.concatenate([e_tgt_bb] + es_tgt, axis=-1),
        "cnt": jnp.concatenate([e_cnt] + es_cnt, axis=-1),
        "key": jnp.concatenate([e_key] + es_key, axis=-1),
        "present": jnp.concatenate([e_present] + es_ok, axis=-1),
    }

    return {
        "win": jnp.swapaxes(win, 1, 2),
        "wkey": jnp.swapaxes(wkey, 1, 2),
        "exit_cnt": exit_cnt,
        "exit_key": exit_key,
        "long_u": long_u,
        "long_w": long_w,
        "long_cnt": long_cnt,
        "long_key": long_key,
        "long_esc": long_esc,
        "cov": jnp.where(in_range, cov_lin, 0),
        "unsup": unsup & in_range,
        "weight": jnp.where(in_range, weight, 0),
        "base": jnp.where(in_range, base, 0).astype(jnp.uint8),
        "bbpos": jnp.where(in_range, bbpos, 0),
        "n": n_total,
        "enter": enter,
        "flags": flags,
        "wneed": wneed,
        "nlong": n_long,
    }


@functools.partial(jax.jit, static_argnames=("caps",))
def device_build(ops, starts, bb, ins_base, Lr, caps: Caps):
    """Full device graph build: encoded reads -> banded linear graph.

    Returns the assemble_band dict plus per-target fallback flags
    (cascade, overflow, sentinel bases)."""
    dec = decode_columns(ops, starts, caps)
    cov, matches = coverage_and_matches(ops, starts, dec, caps)
    mtab = matched_positions(ops, dec, starts, Lr, caps)
    chains = extract_chains(ops, starts, ins_base, dec, mtab[0], Lr, caps)
    trans = transitions_table(dec, mtab, chains, starts, Lr, caps)
    absb = apply_absorption(chains, trans, bb, Lr, caps)
    fc = {
        "valid": absb["valid"].reshape(caps.B, -1),
        "p": absb["p"],
        "t": absb["t"],
        "len": absb["len"],
        "rev_ba": absb["rev_ba"],
        "read": absb["read"],
        "phase": absb["phase"],
        "seq": absb["seq"],
    }
    tri = build_tries(fc, Lr, caps)
    linz = linearize_and_band(
        tri, fc, absb, trans, cov, matches, bb, Lr, caps
    )
    out = assemble_band(linz, absb, trans, cov, matches, bb, Lr, caps)
    rbv = fc["rev_ba"] & 0xFF  # [B, SM, N]
    sentinel = jnp.any(
        (fc["valid"])
        & (jnp.any(rbv == 94, axis=1) | jnp.any(rbv == 36, axis=1)),
        axis=-1,
    )
    out["flag_detail"] = {
        "band": out["flags"],  # span > W / SE overflow
        "caps": linz["flags_partial"],  # ND / V / trie-parent span
        "cascade": absb["cascade"],
        "over_dd": absb["over_dd"],
        "over_dq": trans["over_dq"],
        "chain_len": chains["overflow_any"],
        "sentinel": sentinel,
    }
    out["flags"] = (
        out["flags"]
        | linz["flags_partial"]
        | absb["cascade"]
        | absb["over_dd"]
        | trans["over_dq"]
        | chains["overflow_any"]
        | sentinel
    )
    return out


def unpack_ops(opsp):
    """Unpack a 2-bit-packed ops stream [B, R, C//4] u8 -> [B, R, C] u8.

    Byte k holds columns 4k..4k+3, column 4k in bits 0-1 (the wire
    format of `dagcon_enc_fill_packed`). Two vector ops; fuses into the
    build program so the 4x-smaller upload costs no extra dispatch."""
    shifts = jnp.arange(4, dtype=jnp.uint8) * jnp.uint8(2)  # [4]
    u = (opsp[..., None] >> shifts) & jnp.uint8(3)
    return u.reshape(opsp.shape[0], opsp.shape[1], -1)


@functools.partial(jax.jit, static_argnames=("caps",))
def device_build_packed(opsp, starts, bb, ins_base, Lr, caps: Caps):
    """device_build over a 2-bit-packed ops stream (see unpack_ops)."""
    return device_build(unpack_ops(opsp), starts, bb, ins_base, Lr, caps)
