"""Pallas kernel-variant microbench (chained-in-one-jit timing):
histogram variants + fused payload-scatter kernel vs the XLA
mxu_scatter, at the devbuild's real shapes.

    python tools/prof_pk.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
BF16 = jnp.bfloat16
K = 12
FLOOR = 0.0


def chain(name, body, x0, extra=(), iters=K, reps=3):
    def prog(x, *e):
        def it(_, c):
            return body(c, *e)
        out = jax.lax.fori_loop(0, iters, it, x)
        return sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(out)
        )

    f = jax.jit(prog)
    try:
        _ = np.asarray(f(x0, *extra))
    except Exception as e:
        print(f"{name:48s} FAILED: {type(e).__name__} "
              f"{str(e)[:120]}", flush=True)
        return
    ts = []
    for _ in range(reps):
        t0 = time.time()
        _ = np.asarray(f(x0, *extra))
        ts.append(time.time() - t0)
    t = min(ts)
    print(f"{name:48s} {(t - FLOOR) / iters * 1000:8.3f} ms/op "
          f"(total {t*1000:6.1f})", flush=True)


def hist_v0(values, D, nc=2048):
    """Current _pallas_hist (in-kernel per-chunk reshape)."""
    from pbdagcon_tpu.ops.mxu import _pallas_hist

    return _pallas_hist(values, D, nc=nc)


def hist_v1(values, D, nc=2048):
    """XLA-side pre-transpose: kernel reads [8, nchunks, nc, 1] blocks
    (values already columns), no in-kernel relayout."""
    B, N = values.shape
    LANES = 128
    dh = -(-D // LANES)
    npad = -(-N // nc) * nc
    ROWS = 8
    bpad = -(-B // ROWS) * ROWS
    if npad != N or bpad != B:
        values = jnp.pad(
            values, ((0, bpad - B), (0, npad - N)), constant_values=-1
        )
    nchunks = npad // nc
    vcol = values.reshape(bpad, nchunks, nc, 1)  # XLA relayout, 1 pass

    def kernel(v_ref, o_ref, acc_ref):
        for r in range(ROWS):
            acc_ref[:, :] = jnp.zeros_like(acc_ref)

            def body(c, _):
                v = v_ref[r, c]  # [nc, 1] already columns
                a = (
                    v // LANES
                    == jax.lax.broadcasted_iota(I32, (nc, dh), 1)
                ).astype(BF16)
                bm = (
                    v % LANES
                    == jax.lax.broadcasted_iota(I32, (nc, LANES), 1)
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
            pl.BlockSpec((ROWS, nchunks, nc, 1), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, dh, LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bpad, dh, LANES), I32),
        scratch_shapes=[pltpu.VMEM((dh, LANES), jnp.float32)],
    )(vcol)
    return out.reshape(bpad, dh * LANES)[:B, :D]


def hist_v2(values, D, nc=2048):
    """Row-at-once transpose: one [1, npad] -> [npad, 1] relayout per
    row inside the kernel, chunks sliced from the column."""
    B, N = values.shape
    LANES = 128
    dh = -(-D // LANES)
    npad = -(-N // nc) * nc
    ROWS = 8
    bpad = -(-B // ROWS) * ROWS
    if npad != N or bpad != B:
        values = jnp.pad(
            values, ((0, bpad - B), (0, npad - N)), constant_values=-1
        )
    nchunks = npad // nc

    def kernel(v_ref, o_ref, acc_ref, col_ref):
        for r in range(ROWS):
            acc_ref[:, :] = jnp.zeros_like(acc_ref)
            col_ref[:, :] = v_ref[r, :].reshape(npad, 1)

            def body(c, _):
                v = col_ref[pl.ds(c * nc, nc), :]
                a = (
                    v // LANES
                    == jax.lax.broadcasted_iota(I32, (nc, dh), 1)
                ).astype(BF16)
                bm = (
                    v % LANES
                    == jax.lax.broadcasted_iota(I32, (nc, LANES), 1)
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
        out_specs=pl.BlockSpec((ROWS, dh, LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bpad, dh, LANES), I32),
        scratch_shapes=[pltpu.VMEM((dh, LANES), jnp.float32),
                        pltpu.VMEM((npad, 1), I32)],
    )(values)
    return out.reshape(bpad, dh * LANES)[:B, :D]


def pallas_scatter(ranks, payloads, D, nbytes, nc=2048, dh_blk=None):
    """Fused unique-rank scatter: out[b, ranks[b,n]] = payloads[k][b,n].
    ranks < 0 are dropped. Grid (b, dh-chunks) keeps VMEM blocks small;
    each dh-chunk re-reads the values (cheap) and accumulates only its
    rank range."""
    B, N = ranks.shape
    LANES = 128
    NP = len(payloads)
    dh = -(-D // LANES)
    if dh_blk is None:
        dh_blk = dh
        while dh_blk > 96:  # VMEM out block + axon grid limit balance
            for cand in range(dh_blk - 1, 0, -1):
                if dh % cand == 0:
                    dh_blk = cand
                    break
            else:
                dh_blk = dh
                break
    nchunks_d = dh // dh_blk
    npad = -(-N // nc) * nc
    ROWS = 8
    bpad = -(-B // ROWS) * ROWS

    def padx(x, fill):
        if npad != N or bpad != B:
            return jnp.pad(
                x, ((0, bpad - B), (0, npad - N)), constant_values=fill
            )
        return x

    r_ = padx(ranks, -1)
    ps = [padx(p.astype(I32), 0) for p in payloads]
    nchunks = npad // nc
    PLANES = NP * nbytes * LANES

    def kernel(r_ref, *rest):
        p_refs = rest[:NP]
        o_ref = rest[NP]
        acc_ref = rest[NP + 1]
        dc = pl.program_id(1)
        base = dc * dh_blk * LANES
        for r in range(ROWS):
            acc_ref[:, :] = jnp.zeros_like(acc_ref)

            def body(c, _):
                v = r_ref[r, pl.ds(c * nc, nc)].reshape(nc, 1) - base
                a = (
                    v // LANES
                    == jax.lax.broadcasted_iota(I32, (nc, dh_blk), 1)
                ).astype(BF16)
                vl = v % LANES
                bm = (
                    vl == jax.lax.broadcasted_iota(I32, (nc, LANES), 1)
                )
                cols = []
                for k in range(NP):
                    pv = p_refs[k][r, pl.ds(c * nc, nc)].reshape(nc, 1)
                    for by in range(nbytes):
                        cols.append(
                            jnp.where(
                                bm, ((pv >> (8 * by)) & 0xFF), 0
                            ).astype(BF16)
                        )
                rhs = jnp.concatenate(cols, axis=-1)
                acc_ref[:, :] += jax.lax.dot_general(
                    a, rhs,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return 0

            jax.lax.fori_loop(0, nchunks, body, 0)
            o_ref[r, :, :] = acc_ref[:, :].astype(I32)

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
        out_shape=jax.ShapeDtypeStruct((bpad, dh, PLANES), I32),
        scratch_shapes=[pltpu.VMEM((dh_blk, PLANES), jnp.float32)],
    )(r_, *ps)
    # out[b, dh, NP*nbytes*128] -> per payload [B, D]
    res = []
    for k in range(NP):
        tot = jnp.zeros((bpad, dh * LANES), I32)
        for by in range(nbytes):
            sl = out[:, :, (k * nbytes + by) * LANES:
                     (k * nbytes + by + 1) * LANES]
            tot = tot + (sl.reshape(bpad, dh * LANES) << (8 * by))
        res.append(tot[:B, :D])
    return tuple(res)


def main():
    global FLOOR
    rng = np.random.default_rng(0)
    B = 128

    x = jnp.asarray(rng.integers(0, 100, (B, 256)), dtype=I32)
    f = jax.jit(lambda x: jnp.sum(
        jax.lax.fori_loop(0, K, lambda i, c: c + 1, x)
    ).astype(jnp.float32))
    _ = np.asarray(f(x))
    ts = []
    for _ in range(3):
        t0 = time.time()
        _ = np.asarray(f(x))
        ts.append(time.time() - t0)
    FLOOR = min(ts)
    print(f"floor: {FLOOR*1000:.1f} ms", flush=True)

    for D, N in ((1026, 40960), (9234, 40960), (8208, 6144)):
        vals = jnp.asarray(rng.integers(0, D, (B, N)), dtype=I32)

        def mk(h):
            def body(c):
                o = h(c, D)
                return (c + o[:, :1]) % D
            return body

        chain(f"hist[N={N},D={D}] v0 current", mk(hist_v0), vals)
        chain(f"hist[N={N},D={D}] v1 pre-T", mk(hist_v1), vals)
        chain(f"hist[N={N},D={D}] v2 rowcol", mk(hist_v2), vals)

    # scatter: SE-block shape [128, 6144] -> D=78848, 2 i32 payloads
    N, D = 6144, 78848
    ranks = jnp.asarray(
        rng.permutation(np.arange(D))[None, :N].repeat(B, 0), dtype=I32
    )
    pay = jnp.asarray(rng.integers(0, 1 << 28, (B, N)), dtype=I32)

    def sc_pallas(c, r):
        o1, o2 = pallas_scatter(r, (c, c + 1), D, 4)
        return (c + o1[:, :1] + o2[:, :1]) % (1 << 28)

    chain("scatter[6144->78848] pallas 2xi32", sc_pallas, pay, (ranks,))

    from pbdagcon_tpu.ops import mxu

    def sc_xla(c, r):
        o1, o2 = mxu.mxu_scatter(
            r, r >= 0, (c, c + 1), D, chunk=N, max_payload=1 << 31
        )
        return (c + o1[:, :1] + o2[:, :1]) % (1 << 28)

    chain("scatter[6144->78848] XLA mxu 2xi32", sc_xla, pay, (ranks,))

    # tiered SE plan shapes: per-slot dense scatter at D=V, plus a
    # compacted tail at D=12*V with N/2 rows.
    V = 5632
    ranks_v = jnp.asarray(
        rng.permutation(np.arange(8192))[None, :N].repeat(B, 0) % V,
        dtype=I32,
    )

    def sc_slot(c, r):
        o1, o2 = pallas_scatter(r, (c, c + 1), V, 4)
        return (c + o1[:, :1] + o2[:, :1]) % (1 << 28)

    chain("scatter[6144->V=5632] pallas 2xi32", sc_slot, pay, (ranks_v,))

    NT, DT = 3072, 12 * 5632
    ranks_t = jnp.asarray(
        rng.permutation(np.arange(DT))[None, :NT].repeat(B, 0), dtype=I32
    )
    pay_t = jnp.asarray(rng.integers(0, 1 << 28, (B, NT)), dtype=I32)

    def sc_tail(c, r):
        o1, o2 = pallas_scatter(r, (c, c + 1), DT, 4)
        return (c + o1[:, :1] + o2[:, :1]) % (1 << 28)

    chain("scatter[3072->12V] pallas 2xi32", sc_tail, pay_t, (ranks_t,))

    # tail-compaction sort: [B, 6144] u16 key + 2 u32 payloads
    k6 = jnp.asarray(rng.integers(0, 6144, (B, N)), dtype=I32)

    def s3(c):
        a, b2, c2 = jax.lax.sort(
            (c.astype(jnp.uint16), (c + 1).astype(jnp.uint32),
             (c + 2).astype(jnp.uint32)),
            dimension=-1, num_keys=1,
        )
        return (a.astype(I32) + b2.astype(I32) + c2.astype(I32)) % 6144

    chain("sort[6144] u16+2xu32 3-op", s3, k6)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
