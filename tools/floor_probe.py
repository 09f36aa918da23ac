"""Runnable floor probe (VERDICT r4 #6): chain the devbuild's
irreducible primitive set at bench caps inside ONE jit and measure the
composition with the honest timer — validating (or correcting) the
docs/ROOFLINE.md paper floor, which summed best-known per-primitive
rates without checking they compose (VMEM pressure, fusion boundaries,
layout transitions).

The primitive set mirrors the round-5 build: the two wide u16 sorts
(extract compaction 4-op, mpos permutation 2-op), the three counting
passes (matches D~1k, transitions D~9k, transition read-bitmask), the
narrow trie/classify sorts, the p-space slot scatter, the multi-plane
v-space transport, a band-class write + transpose, and the stacked
cummax/cummin scans. Real data dependencies chain each iteration.

    python tools/floor_probe.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

K = 8


def main() -> int:
    from pbdagcon_tpu.ops import mxu

    B, R, C, L = 128, 32, 1280, 1024
    ND, V, W, SE, DQ, SM, N6 = 4608, 5632, 64, 14, 6, 8, 6144
    RC = R * C
    DKEY = (L + 2) * (DQ + 3)
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.integers(0, 100, (B, 256)), dtype=jnp.int32)
    f0 = jax.jit(lambda x: jnp.sum(
        jax.lax.fori_loop(0, K, lambda i, c: c + 1, x)
    ).astype(jnp.float32))
    _ = np.asarray(f0(x))
    ts = []
    for _ in range(3):
        t0 = time.time()
        _ = np.asarray(f0(x))
        ts.append(time.time() - t0)
    floor_disp = min(ts)
    print(f"dispatch floor: {floor_disp*1000:.1f} ms", flush=True)

    seed = jnp.asarray(
        rng.integers(0, 1 << 15, (B, RC)), dtype=jnp.int32
    )

    def step(c):
        # c: [B, RC] i32 evolving state (everything derives from it).
        u16 = (c & 0xFFFF).astype(jnp.uint16)
        # extract compaction: 4-op u16 sort over the ops grid
        s1 = jax.lax.sort(
            (u16, u16 + 1, u16 + 2, u16 + 3), dimension=-1, num_keys=1
        )
        # mpos permutation: 2-op u16 sort
        s2 = jax.lax.sort(
            (u16 + 4, u16 + 5), dimension=-1, num_keys=1
        )
        ci = s1[0].astype(jnp.int32) + s2[0].astype(jnp.int32)
        ones = jnp.ones_like(ci, bool)
        # counting passes: match hist, transitions hist, read bitmask
        h1 = mxu.mxu_hist(ci % (L + 2), ones, L + 2, chunk=4096)
        h2 = mxu.mxu_hist(ci % DKEY, ones, DKEY, chunk=4096)
        (m1,) = mxu.mxu_weighted_hist(
            ci % DKEY, ones,
            (jnp.left_shift(jnp.int32(1), ci & 31),), DKEY,
        )
        # narrow sorts (trie 5-op + classify 5-op + su 5-op)
        n1 = (ci[:, :N6] & 0x3FFFFFFF)
        t5 = jax.lax.sort(
            tuple(n1 + j for j in range(5)), dimension=-1, num_keys=2
        )
        cl = jax.lax.sort(
            tuple(n1 + j for j in range(5)), dimension=-1, num_keys=1
        )
        # p-space slot scatter + multi-plane v-space transport
        ranks = jnp.argsort(n1[:, : SE * (L + 2) // 8], axis=-1)
        t_nc, t_k = mxu.mxu_scatter(
            n1 % (SE * (L + 2)), ones[:, :N6], (n1, n1 + 1),
            SE * (L + 2), chunk=N6, max_payload=1 << 31,
        )
        pic = (cl[0][:, :V] % (L + 2))
        planes = (
            [(t_nc.reshape(B, SE, L + 2)[:, i, :], 4) for i in range(SE)]
            + [(t_k.reshape(B, SE, L + 2)[:, i, :], 4) for i in range(SE)]
            + [(h1, 2) for _ in range(DQ - 1)]
            + [(h2[:, : L + 2], 4) for _ in range(DQ - 1)]
        )
        pv = mxu.mxu_gather_planes(planes, pic)
        # band write (one-lane class per plane set) + transpose
        win = jnp.full((B, W, V), jnp.int16(-1))
        for j in range(3):
            span = (pv[j] % W) + 1
            m = (
                jnp.arange(W, dtype=jnp.int32)[None, :, None]
                == (span[:, None, :] - 1)
            )
            win = jnp.where(
                m, (pv[j] & 0x7F).astype(jnp.int16)[:, None, :], win
            )
        winT = jnp.swapaxes(win, 1, 2)
        # stacked scans (tries closed forms)
        g = ci[:, :N6]
        bnd = (g & 7) == 0
        posb = jnp.broadcast_to(
            jnp.arange(N6, dtype=jnp.int32), (B, N6)
        )[:, None, :]
        bnd_dm = jnp.broadcast_to(bnd[:, None, :], (B, SM, N6))
        own = jax.lax.cummax(jnp.where(bnd_dm, posb, 0), axis=2)
        re = jnp.flip(
            jax.lax.cummin(
                jnp.flip(jnp.where(bnd_dm, posb, N6), axis=-1), axis=2
            ),
            axis=-1,
        )
        acc = (
            jnp.sum(winT.astype(jnp.int32))
            + jnp.sum(m1) + jnp.sum(t5[0]) + jnp.sum(own) + jnp.sum(re)
            + jnp.sum(ranks)
        )
        return (c + (acc & 1) + 1) & 0x7FFF

    f = jax.jit(lambda c: jnp.sum(
        jax.lax.fori_loop(0, K, lambda i, s: step(s), c)
        .astype(jnp.float32)
    ))
    t0 = time.time()
    _ = np.asarray(f(seed))
    print(f"compile {time.time()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time()
        _ = np.asarray(f(seed))
        ts.append(time.time() - t0)
    t = (min(ts) - floor_disp) / K * 1000
    print(
        f"floor_measured_ms (primitive composition, bench caps): "
        f"{t:.1f} ms/batch", flush=True,
    )
    print(
        f"implied exec-only ceiling at 118,642 bases/batch, +5.6 ms "
        f"DP+emit: {118642 / ((t + 5.6) / 1000):,.0f} b/s", flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
