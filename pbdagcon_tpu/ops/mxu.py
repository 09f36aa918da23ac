"""MXU-native histograms, grid searchsorted, and unique-rank scatters.

The devbuild program's `lax.sort` calls fall into three families, two of
which do not actually need a comparison sort:

  1. **Histograms** — sort the values, then `searchsorted` a full
     integer grid to read off run lengths. The counts per key over a
     known domain D are a *counting* problem, not a sorting problem.
  2. **Searchsorted on a full grid** — `lo[d] = #{v < d}`,
     `hi[d] = #{v <= d}` for every d in 0..D-1. These are exclusive /
     inclusive prefix sums of the same histogram.
  3. **Scatters with known ranks** — "sort by key" where the key *is* a
     precomputed destination rank (stable compaction by a flag, a
     computed permutation, interleaving two ascending sequences). The
     sort is only transport; the destination of every element is
     already known.

All three have an exact, sort-free MXU formulation via factorized
one-hot matmuls. Write the destination d = dh*128 + dl; then

    hist[dh, dl]  = sum_n A[n, dh] * B[n, dl]          =  A^T @ B
    out[dh, dl]   = sum_n A[n, dh] * (B[n, dl] * p_n)  =  A^T @ (B*p)

where A[n, dh] = 1[v_n div 128 == dh] (AND validity) and
B[n, dl] = 1[v_n mod 128 == dl]. The cross terms vanish because the
product A[n,dh]*B[n,dl] is 1 iff v_n == dh*128+dl exactly. One-hot
entries are exactly 0.0/1.0 in bf16; with float32 accumulation
(`preferred_element_type`) histogram counts are exact up to 2^24 and
scatter payloads are exact when byte-split (each byte <= 255 is exact
in bf16, and unique ranks mean each output cell receives exactly one
nonzero term). This moves the work onto the systolic array — which is
otherwise idle during the graph build — instead of XLA's O(N log^2 N)
bitonic sorting network.

Used by `ops/devbuild_jax.py` (reference: the `AlnGraphBoost`
`addAln`/`mergeNodes` pipeline, src/cpp/AlnGraphBoost.cpp ~180-380,
SURVEY.md §3.3 — reconstructed; mount empty). Bit-exactness is pinned
by `tests/test_mxu.py` against NumPy and by the existing devbuild
differential suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
BF16 = jnp.bfloat16
_LANES = 128


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _pallas_hist(values, D, *, nc: int = 2048):
    """Fused one-hot histogram kernel: builds the factorized one-hots
    chunk-by-chunk in VMEM and accumulates A^T @ B on the MXU — the
    one-hot operands never touch HBM (the XLA formulation materializes
    ~2 GB of bf16 one-hots per 41k-row batch; this kernel's traffic is
    just the values read once).

    values: [B, N] i32 with -1 for invalid rows. Returns [B, D] i32."""
    B, N = values.shape
    dh = -(-D // _LANES)
    npad = -(-N // nc) * nc
    ROWS = 8  # sublane tile: 8 batch rows per grid step
    bpad = -(-B // ROWS) * ROWS
    if npad != N or bpad != B:
        values = jnp.pad(
            values, ((0, bpad - B), (0, npad - N)), constant_values=-1
        )
    nchunks = npad // nc

    def kernel(v_ref, o_ref, acc_ref):
        for r in range(ROWS):
            acc_ref[:, :] = jnp.zeros_like(acc_ref)

            def body(c, _):
                v = v_ref[r, pl.ds(c * nc, nc)].reshape(nc, 1)
                a = (
                    v // _LANES
                    == jax.lax.broadcasted_iota(I32, (nc, dh), 1)
                ).astype(BF16)
                bm = (
                    v % _LANES
                    == jax.lax.broadcasted_iota(I32, (nc, _LANES), 1)
                ).astype(BF16)
                acc_ref[:, :] += jax.lax.dot_general(
                    a, bm,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return 0

            jax.lax.fori_loop(0, nchunks, body, 0)
            o_ref[r, :, :] = acc_ref[:, :].astype(I32)

    out = pl.pallas_call(
        kernel,
        grid=(bpad // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, npad), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, dh, _LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bpad, dh, _LANES), I32),
        scratch_shapes=[pltpu.VMEM((dh, _LANES), jnp.float32)],
    )(values)
    return out.reshape(bpad, dh * _LANES)[:B, :D]


def _pad_chunks(x, chunk, fill):
    """[B, N] -> [B, nc, chunk] padded with `fill`."""
    B, N = x.shape
    nc = -(-N // chunk)
    pad = nc * chunk - N
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((B, pad), fill, dtype=x.dtype)], axis=-1
        )
    return x.reshape(B, nc, chunk)


def _factor_onehots(vals, dh_count):
    """vals [B, Nc] i32 (invalid rows must hold -1) ->
    A [B, Nc, dh_count] bf16, Bm [B, Nc, LANES] bf16."""
    vh = vals // _LANES
    vl = vals % _LANES  # -1 -> (-1, 127) in python semantics; vh=-1 kills it
    a = (
        vh[..., None] == jnp.arange(dh_count, dtype=I32)
    ).astype(BF16)
    bm = (
        vl[..., None] == jnp.arange(_LANES, dtype=I32)
    ).astype(BF16)
    return a, bm


def _matmul_acc(a, bm):
    """Batched A^T @ B with f32 accumulation: [B, Nc, H] x [B, Nc, M]
    -> [B, H, M]."""
    return jax.lax.dot_general(
        a, bm,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def mxu_hist(values, valid, D, *, chunk: int = 4096):
    """Counts per value over domain [0, D): [B, N] -> [B, D] i32.

    Strategy is picked from the measured crossover on TPU v5e: a fused
    compare-and-reduce (VPU) wins for small domains (~4 ms at
    N=41k/D=1026 vs ~10 ms for the matmul), the factorized one-hot
    matmul (MXU) wins for large domains (~2 ms at N=6k/D=8208 vs ~5 ms
    compare-reduce). Both are exact: integer sums below 2^24."""
    B, N = values.shape
    v = jnp.where(valid, values.astype(I32), jnp.int32(-1))
    # Pallas kernel gate: its [8, N] VMEM input block must stay well
    # under the 16 MB VMEM (measured OOM at N=330k); huge-N depth
    # shapes take the chunked XLA matmul below instead.
    if _on_tpu() and B * N >= (1 << 18) and N <= (1 << 17):
        return _pallas_hist(v, D)
    if D <= 2048:
        return jnp.sum(
            v[:, :, None] == jnp.arange(D, dtype=I32)[None, None, :],
            axis=1, dtype=I32,
        )
    dh = -(-D // _LANES)
    vc = _pad_chunks(v, chunk, -1)
    nc = vc.shape[1]

    def body(acc, vals):
        a, bm = _factor_onehots(vals, dh)
        return acc + _matmul_acc(a, bm), None

    if nc == 1:
        a, bm = _factor_onehots(vc[:, 0], dh)
        acc = _matmul_acc(a, bm)
    else:
        acc, _ = jax.lax.scan(
            body,
            jnp.zeros((B, dh, _LANES), jnp.float32),
            jnp.moveaxis(vc, 1, 0),
        )
    return acc.reshape(B, dh * _LANES)[:, :D].astype(I32)


def mxu_gather(tbl, idx, *, max_val: int, valid=None):
    """Sort-free, loop-free gather out[b, n] = tbl[b, idx[b, n]] as a
    factorized one-hot matmul — ~5x the TPU's per-index hardware gather
    rate at these shapes (measured 1.55 ms vs 8.0 ms for
    [128, 6144] <- [128, 6144] tables).

    out = sum_h 1[idx div 128 == h] * (B2 @ plane_h^T) with
    B2[n, l] = 1[idx mod 128 == l] and the table byte-split so every
    bf16 factor is an exact small integer; each output cell receives
    exactly one nonzero term, so the f32 result is exact.

    tbl: [B, T] integer in [0, max_val); idx: [B, N]. Out-of-range
    indices are CLAMPED to the padded table bounds (they read a real
    boundary element, or 0 in the zero-padded tail T..dh*128); indices
    masked off via `valid` genuinely read 0. Callers that need
    out-of-range reads to be 0 must pre-clip or pass `valid`. Use only
    for T <= ~16k (cost scales with T); wider tables should keep the
    hardware gather."""
    B, T = tbl.shape
    dh = -(-T // _LANES)
    pad = dh * _LANES - T
    tp = tbl.astype(I32)
    if pad:
        tp = jnp.concatenate(
            [tp, jnp.zeros((B, pad), I32)], axis=-1
        )
    tr = tp.reshape(B, dh, _LANES)
    ic = jnp.clip(idx.astype(I32), 0, dh * _LANES - 1)
    if valid is not None:
        ic = jnp.where(valid, ic, jnp.int32(-1))
    ih = ic // _LANES
    a = (
        ih[..., None] == jnp.arange(dh, dtype=I32)
    )  # [B, N, dh] bool (kept bool: used as a select mask)
    b2 = (
        (ic % _LANES)[..., None] == jnp.arange(_LANES, dtype=I32)
    ).astype(BF16)
    nbytes = max(1, -(-max(1, (max_val - 1)).bit_length() // 8))
    out = jnp.zeros(idx.shape, I32)
    for by in range(nbytes):
        plane = ((tr >> (8 * by)) & 0xFF).astype(BF16)
        p = jax.lax.dot_general(
            b2, plane,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [B, N, dh]
        sel = jnp.sum(jnp.where(a, p, 0.0), axis=-1).astype(I32)
        out = out | (sel << (8 * by))
    return out


def mxu_gather_planes(tables, idx):
    """Gather MANY tables at ONE shared index: out[k][b, n] =
    tables[k][0][b, idx[b, n]] — the one-hot operands are built once
    and all tables' byte-planes ride a single lane-concatenated matmul.

    tables: list of ([B, T] integer array, nbytes) pairs — nbytes
    byte-planes cover that table's value range. idx: [B, N] (clipped
    to the zero-padded table bound, so out-of-range reads 0 when
    idx >= T is only possible in the padded tail).

    Exact: each dot output cell has exactly ONE nonzero term (the
    idx%128 lane), every byte value <= 255 is bf16-exact, and the
    dh-select sums one nonzero f32. Cost ~ one [B, N, 128] x
    [B, S*dh, 128] matmul with S = total byte-planes — built for the
    devbuild's p-space -> v-space plane transport (dq/SE bands), where
    per-plane gathers or a rank scatter pay per plane."""
    B, T = tables[0][0].shape
    TP = -(-T // _LANES) * _LANES
    pad = TP - T
    ic = jnp.clip(idx.astype(I32), 0, TP - 1)
    # FULL-width one-hot (no dh factorization): the factorized form's
    # [B, N, S*dh] partials cost dh x the useful data in traffic plus a
    # select pass; at the plane-transport shapes (T ~ 1k, S ~ 150) the
    # single wide one-hot is cheaper end-to-end.
    b_full = (
        ic[..., None] == jnp.arange(TP, dtype=I32)
    ).astype(BF16)  # [B, N, TP]
    subs = []  # (table_idx, byte) per subplane, in lane-concat order
    planes = []
    for k, (tbl, nbytes) in enumerate(tables):
        tp = tbl.astype(I32)
        if pad:
            tp = jnp.concatenate(
                [tp, jnp.zeros((B, pad), I32)], axis=-1
            )
        for by in range(nbytes):
            subs.append((k, by))
            planes.append(((tp >> (8 * by)) & 0xFF).astype(BF16))
    stacked = jnp.stack(planes, axis=1)  # [B, S, TP]
    sel = jax.lax.dot_general(
        b_full, stacked,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=BF16,  # exact: single nonzero, <= 255
    ).astype(I32)  # [B, N, S]
    out = [jnp.zeros(idx.shape, I32) for _ in tables]
    for j, (k, by) in enumerate(subs):
        out[k] = out[k] | (sel[:, :, j] << (8 * by))
    return out


def hist_lohi(values, valid, D, *, chunk: int = 4096):
    """(lo, hi) over the FULL grid 0..D-1: lo[d] = #{v < d},
    hi[d] = #{v <= d}. Replaces `sort + searchsorted(arange(D))`
    (`_row_ss_lr` on a full-grid query) with hist + cumsum."""
    h = mxu_hist(values, valid, D, chunk=chunk)
    hi = jnp.cumsum(h, axis=-1, dtype=I32)
    lo = hi - h
    return lo, hi


def _pallas_scatter(ranks, payloads, D, nbytes, *, nc: int = 2048):
    """Fused unique-rank scatter kernel: the factorized one-hots and
    byte-split payload planes are built chunk-by-chunk in VMEM and
    accumulated on the MXU — the XLA form materializes
    [B, N, NP*nbytes*128] bf16 payload planes in HBM (~1.6 GB at the
    devbuild's SE shape), which dominates its cost.

    ranks: [B, N] i32 (< 0 = dropped), unique among kept rows.
    payloads: tuple of [B, N] i32. Returns tuple of [B, D] i32.
    Grid is (B/8, dh-chunks); each dh-chunk re-reads the (small) value
    rows and accumulates only its own rank range, keeping the VMEM
    output block bounded. Caller gates shapes (see mxu_scatter)."""
    B, N = ranks.shape
    NP = len(payloads)
    dh = -(-D // _LANES)
    dh_blk = min(dh, 88)
    dh_pad = -(-dh // dh_blk) * dh_blk
    nchunks_d = dh_pad // dh_blk
    npad = -(-N // nc) * nc
    ROWS = 8
    bpad = -(-B // ROWS) * ROWS

    def padx(x, fill):
        if npad != N or bpad != B:
            return jnp.pad(
                x, ((0, bpad - B), (0, npad - N)), constant_values=fill
            )
        return x

    r_ = padx(ranks.astype(I32), -1)
    ps = [padx(p.astype(I32), 0) for p in payloads]
    nchunks = npad // nc
    PLANES = NP * nbytes * _LANES

    def kernel(r_ref, *rest):
        p_refs = rest[:NP]
        o_ref = rest[NP]
        acc_ref = rest[NP + 1]
        dc = pl.program_id(1)
        base = dc * dh_blk * _LANES

        def row(r, _):
            acc_ref[:, :] = jnp.zeros_like(acc_ref)

            def body(c, _):
                v = r_ref[r, pl.ds(c * nc, nc)].reshape(nc, 1) - base
                a = (
                    v // _LANES
                    == jax.lax.broadcasted_iota(I32, (nc, dh_blk), 1)
                ).astype(BF16)
                bm = (
                    v % _LANES
                    == jax.lax.broadcasted_iota(I32, (nc, _LANES), 1)
                ).astype(BF16)
                # per-(payload, byte) plane dots into acc slices: small
                # bf16 temps only (a fat concat + int32 where temps
                # blow the VMEM stack at small dh). Both loops (rows,
                # chunks) are runtime fori_loops so unrolling can't
                # stack per-iteration temps (measured 40+ MB scoped-
                # vmem OOM when unrolled at single-chunk shapes).
                for k in range(NP):
                    pv = p_refs[k][r, pl.ds(c * nc, nc)].reshape(nc, 1)
                    for by in range(nbytes):
                        pb = ((pv >> (8 * by)) & 0xFF).astype(BF16)
                        j = (k * nbytes + by) * _LANES
                        acc_ref[:, j:j + _LANES] += jax.lax.dot_general(
                            a, bm * pb,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                return 0

            jax.lax.fori_loop(0, nchunks, body, 0)
            o_ref[r, :, :] = acc_ref[:, :].astype(I32)
            return 0

        jax.lax.fori_loop(0, ROWS, row, 0)

    out = pl.pallas_call(
        kernel,
        grid=(bpad // ROWS, nchunks_d),
        in_specs=[
            pl.BlockSpec((ROWS, npad), lambda b, d: (b, 0),
                         memory_space=pltpu.VMEM)
        ] * (1 + NP),
        out_specs=pl.BlockSpec(
            (ROWS, dh_blk, PLANES), lambda b, d: (b, d, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bpad, dh_pad, PLANES), I32),
        scratch_shapes=[pltpu.VMEM((dh_blk, PLANES), jnp.float32)],
    )(r_, *ps)
    res = []
    for k in range(NP):
        tot = jnp.zeros((bpad, dh_pad * _LANES), I32)
        for by in range(nbytes):
            sl = out[:, :, (k * nbytes + by) * _LANES:
                     (k * nbytes + by + 1) * _LANES]
            tot = tot + (
                sl.reshape(bpad, dh_pad * _LANES) << (8 * by)
            )
        res.append(tot[:B, :D])
    return tuple(res)


def mxu_weighted_hist(values, valid, weights, D, *,
                      max_weight: int = 1 << 31):
    """Weighted histogram: out[k][b, d] = sum of weights[k][b, n] over
    valid n with values[b, n] == d. Unlike mxu_scatter, values may
    REPEAT — the accumulation is a sum, which is exact iff every bin's
    per-byte-plane sum stays below 2^24 (f32 integer exactness). The
    canonical caller is the transitions min-read bitmask (weights =
    1 << read with unique (value, read) pairs: per-bin byte sums are
    sums of <= 8 distinct bits <= 255). Caller is responsible for that
    bound. Returns tuple of [B, D] i32."""
    B, N = values.shape
    nbytes = max(1, -(-(max_weight - 1).bit_length() // 8))
    v = jnp.where(valid, values.astype(I32), jnp.int32(-1))
    dh = -(-D // _LANES)
    NP = len(weights)
    if (
        _on_tpu()
        and B >= 8
        and (1 + NP) * (-(-N // 2048) * 2048) <= (1 << 17)
        and NP * nbytes * _LANES <= 1024
        and (-(-B // 8)) * (-(-dh // 88)) <= 112
    ):
        return _pallas_scatter(
            v, [w.astype(I32) for w in weights], D, nbytes
        )
    # XLA fallback (CPU tests take the sort-free chunked matmul form).
    vc = _pad_chunks(v, 4096, -1)
    wc = [_pad_chunks(w.astype(I32), 4096, 0) for w in weights]
    nc = vc.shape[1]

    def step(acc, xs):
        vals = xs[0]
        a, bm = _factor_onehots(vals, dh)
        cols = []
        for p in xs[1:]:
            for by in range(nbytes):
                cols.append(
                    bm * ((p >> (8 * by)) & 0xFF).astype(BF16)[..., None]
                )
        return acc + _matmul_acc(a, jnp.concatenate(cols, -1)), None

    acc0 = jnp.zeros((B, dh, NP * nbytes * _LANES), jnp.float32)
    if nc == 1:
        acc, _ = step(acc0, (vc[:, 0],) + tuple(w[:, 0] for w in wc))
    else:
        acc, _ = jax.lax.scan(
            step, acc0,
            (jnp.moveaxis(vc, 1, 0),)
            + tuple(jnp.moveaxis(w, 1, 0) for w in wc),
        )
    out = []
    for k in range(NP):
        tot = jnp.zeros((B, dh * _LANES), I32)
        for by in range(nbytes):
            sl = acc[:, :, (k * nbytes + by) * _LANES:
                     (k * nbytes + by + 1) * _LANES]
            tot = tot + (
                sl.reshape(B, dh * _LANES).astype(I32) << (8 * by)
            )
        out.append(tot[:, :D])
    return tuple(out)


def mxu_scatter(ranks, valid, payloads, D, *, chunk: int = 4096,
                max_payload: int = 1 << 16):
    """Transport payloads to known destination ranks (sort-free
    "scatter"): out[b, ranks[b, n]] = payloads[k][b, n].

    Requires ranks unique among valid rows (a permutation /
    compaction) — each output cell then receives exactly one nonzero
    term, so the f32 result is the payload bit-exactly. Payloads are
    byte-split so every bf16 factor is an exact small integer.

    payloads: tuple of [B, N] integer arrays in [0, max_payload).
    Returns tuple of [B, D] i32 (cells with no source read 0)."""
    B, N = ranks.shape
    dh = -(-D // _LANES)
    nbytes = max(1, -(-(max_payload - 1).bit_length() // 8))
    r = jnp.where(valid, ranks.astype(I32), jnp.int32(-1))
    # Fused Pallas path (TPU): avoids materializing the one-hot /
    # payload-plane operands in HBM. Gates (measured on this part /
    # axon backend): grid steps (B/8 * dh-chunks) <= 112 (the remote
    # AOT compiler crashes near ~128), VMEM input blocks small
    # (N <= 2^14), payload planes <= 1024 lanes, and enough rows that
    # the kernel's fixed cost amortizes.
    if (
        _on_tpu()
        and B >= 8
        and 1024 <= N <= (1 << 14)
        and len(payloads) * nbytes * _LANES <= 1024
        and (-(-B // 8)) * (-(-dh // 88)) <= 112
    ):
        return _pallas_scatter(
            r, [p.astype(I32) for p in payloads], D, nbytes
        )
    rc = _pad_chunks(r, chunk, -1)
    pc = [
        _pad_chunks(p.astype(I32), chunk, 0) for p in payloads
    ]
    nc = rc.shape[1]
    NP = len(payloads)

    def step(acc, xs):
        vals = xs[0]
        a, bm = _factor_onehots(vals, dh)
        # stack payload bytes along the lane axis: one matmul moves
        # every byte of every payload.
        cols = []
        for p in xs[1:]:
            for by in range(nbytes):
                cols.append(bm * ((p >> (8 * by)) & 0xFF).astype(BF16)[..., None])
        rhs = jnp.concatenate(cols, axis=-1)  # [B, Nc, NP*nbytes*128]
        return acc + _matmul_acc(a, rhs), None

    acc0 = jnp.zeros((B, dh, NP * nbytes * _LANES), jnp.float32)
    if nc == 1:
        acc, _ = step(acc0, (rc[:, 0],) + tuple(p[:, 0] for p in pc))
    else:
        acc, _ = jax.lax.scan(
            step,
            acc0,
            (jnp.moveaxis(rc, 1, 0),)
            + tuple(jnp.moveaxis(p, 1, 0) for p in pc),
        )
    out = []
    for k in range(NP):
        tot = jnp.zeros((B, dh * _LANES), I32)
        for by in range(nbytes):
            sl = acc[:, :, (k * nbytes + by) * _LANES:
                     (k * nbytes + by + 1) * _LANES]
            tot = tot + (
                sl.reshape(B, dh * _LANES).astype(I32) << (8 * by)
            )
        out.append(tot[:, :D])
    return tuple(out)


def mxu_scatter_presence(ranks, valid, D, *, chunk: int = 4096):
    """Presence indicator at unique ranks: out[b, d] = 1 iff some valid
    n has ranks[b, n] == d. One histogram, no payload."""
    return mxu_hist(ranks, valid, D, chunk=chunk)
