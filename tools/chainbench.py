"""Honest per-op timing through the axon tunnel: chain K dependent
iterations of the op inside ONE jit (fori_loop), fetch a scalar, and
difference against the measured dispatch floor.

block_until_ready does NOT wait on this backend (measured: an 8k^3
matmul "takes" 0.05 ms) — every timing must force a host fetch, and
per-op costs below the ~30 ms round-trip floor are only visible
amortized inside one program.

    python tools/chainbench.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

K = 24


def chain(name, body, x0, extra=(), iters=K, reps=3):
    """body(carry, *extra) -> carry (same pytree shape)."""

    def prog(x, *e):
        def it(_, c):
            return body(c, *e)
        out = jax.lax.fori_loop(0, iters, it, x)
        return sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(out)
        )

    f = jax.jit(prog)
    _ = np.asarray(f(x0, *extra))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        _ = np.asarray(f(x0, *extra))
        ts.append(time.time() - t0)
    t = min(ts)
    print(f"{name:56s} {(t - FLOOR) / iters * 1000:8.3f} ms/op "
          f"(total {t*1000:6.1f})", flush=True)


FLOOR = 0.0


def main():
    global FLOOR
    rng = np.random.default_rng(0)
    B = 128

    # measure the dispatch floor: trivial chained op
    x = jnp.asarray(rng.integers(0, 100, (B, 256)), dtype=jnp.int32)

    def trivial(c):
        return c + 1

    f = jax.jit(lambda x: jnp.sum(
        jax.lax.fori_loop(0, K, lambda i, c: trivial(c), x)
    ).astype(jnp.float32))
    _ = np.asarray(f(x))
    ts = []
    for _ in range(3):
        t0 = time.time()
        _ = np.asarray(f(x))
        ts.append(time.time() - t0)
    FLOOR = min(ts)
    print(f"floor (trivial chain, host fetch): {FLOOR*1000:.1f} ms")

    NF, ND = 6144, 6144
    tbl = jnp.asarray(rng.integers(0, 1 << 20, (B, NF)), dtype=jnp.int32)
    idx = jnp.asarray(rng.integers(0, NF, (B, ND)), dtype=jnp.int32)

    # gather: carry the index (feed output back in as next index)
    def g_take(c, t):
        o = jnp.take_along_axis(t, c, axis=-1)
        return jnp.clip(o, 0, NF - 1)

    chain("gather[B,6144<-6144] take_along_axis", g_take, idx, (tbl,))

    def g_mxu(c, t):
        # factorized one-hot matmul gather, byte-split exact
        dh = NF // 128
        a = (c // 128)[..., None] == jnp.arange(dh, dtype=jnp.int32)
        b2 = (c % 128)[..., None] == jnp.arange(128, dtype=jnp.int32)
        tr = t.reshape(B, dh, 128)
        out = jnp.zeros(c.shape, jnp.int32)
        for by in range(3):
            plane = ((tr >> (8 * by)) & 0xFF).astype(jnp.bfloat16)
            p = jax.lax.dot_general(
                b2.astype(jnp.bfloat16), plane,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [B, ND, dh]
            sel = jnp.sum(
                jnp.where(a, p, 0.0), axis=-1
            ).astype(jnp.int32)
            out = out | (sel << (8 * by))
        return jnp.clip(out, 0, NF - 1)

    chain("gather[B,6144<-6144] MXU one-hot 3-byte", g_mxu, idx, (tbl,))

    # sorts: carry keys; derive new keys from sorted output
    k16 = jnp.asarray(rng.integers(0, 1 << 16, (B, 40960)),
                      dtype=jnp.int32)

    def s1(c):
        s = jnp.sort(c.astype(jnp.uint16), axis=-1)
        return (s.astype(jnp.int32) * 7 + 3) & 0xFFFF

    chain("sort[41k] u16 1-op", s1, k16)

    def s2(c):
        a, b = jax.lax.sort(
            (c.astype(jnp.uint16), (c + 1).astype(jnp.uint16)),
            dimension=-1, num_keys=1,
        )
        return (a.astype(jnp.int32) * 7 + b.astype(jnp.int32)) & 0xFFFF

    chain("sort[41k] u16 2-op", s2, k16)

    def s4(c):
        ops = jax.lax.sort(
            tuple((c + j).astype(jnp.uint16) for j in range(4)),
            dimension=-1, num_keys=1,
        )
        return sum(o.astype(jnp.int32) for o in ops) & 0xFFFF

    chain("sort[41k] u16 4-op", s4, k16)

    kn = jnp.asarray(rng.integers(0, 1 << 30, (B, 6144)), dtype=jnp.int32)

    def s1u32(c):
        s = jnp.sort(c.astype(jnp.uint32), axis=-1)
        return (s.astype(jnp.int32) * 7 + 3) & 0x3FFFFFFF

    chain("sort[6k] u32 1-op", s1u32, kn)

    def s2u32(c):
        a, b = jax.lax.sort(
            (c.astype(jnp.uint32), (c + 1).astype(jnp.uint32)),
            dimension=-1, num_keys=1,
        )
        return (a.astype(jnp.int32) + b.astype(jnp.int32)) & 0x3FFFFFFF

    chain("sort[6k] u32 2-op", s2u32, kn)

    # hist: D=1026, N=41k — compare-reduce vs mxu matmul (no scan)
    vals = jnp.asarray(rng.integers(0, 1026, (B, 40960)), dtype=jnp.int32)

    def h_cr(c):
        h = jnp.sum(
            c[:, :, None] == jnp.arange(1026, dtype=jnp.int32),
            axis=1, dtype=jnp.int32,
        )
        # fold back into carry shape
        return (c + h[:, :1]) % 1026

    chain("hist[41k,D=1026] compare-reduce", h_cr, vals)

    from pbdagcon_tpu.ops import mxu

    def h_mxu(c):
        h = mxu.mxu_hist(c, jnp.ones_like(c, bool), 1026, chunk=4096)
        return (c + h[:, :1]) % 1026

    chain("hist[41k,D=1026] mxu (scan chunks)", h_mxu, vals)

    def h_mxu1(c):
        h = mxu.mxu_hist(c, jnp.ones_like(c, bool), 1026, chunk=40960)
        return (c + h[:, :1]) % 1026

    chain("hist[41k,D=1026] mxu single-chunk", h_mxu1, vals)

    v2 = jnp.asarray(rng.integers(0, 8208, (B, 6144)), dtype=jnp.int32)

    def h2_cr(c):
        h = jnp.sum(
            c[:, :, None] == jnp.arange(8208, dtype=jnp.int32),
            axis=1, dtype=jnp.int32,
        )
        return (c + h[:, :1]) % 8208

    chain("hist[6k,D=8208] compare-reduce", h2_cr, v2)

    def h2_mxu(c):
        h = mxu.mxu_hist(c, jnp.ones_like(c, bool), 8208, chunk=8192)
        return (c + h[:, :1]) % 8208

    chain("hist[6k,D=8208] mxu single-chunk", h2_mxu, v2)

    # scatter transport: ranks known, 1 u16 payload, D=6144
    def sc_mxu(c):
        (o,) = mxu.mxu_scatter(
            c, jnp.ones_like(c, bool), (c,), NF, chunk=8192
        )
        return jnp.clip(o, 0, NF - 1)

    chain("scatter[B,6144->6144] mxu u16", sc_mxu, idx)

    def sc_sort(c):
        a, b = jax.lax.sort(
            (c.astype(jnp.uint16), (c % 1024).astype(jnp.uint16)),
            dimension=-1, num_keys=1,
        )
        return (a.astype(jnp.int32) + b.astype(jnp.int32)) % NF

    chain("scatter-as-sort[B,6144] u16 2-op", sc_sort, idx)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
