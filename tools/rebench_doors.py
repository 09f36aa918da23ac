"""Re-audit of pre-round-4 negative results with the HONEST timer
(VERDICT r4 #3): every door below was closed using isolated
`block_until_ready` timings that round 4 proved are dispatch-floor
noise on this backend. Each measurement here chains K dependent
iterations inside ONE jit and fetches a scalar (tools/chainbench.py
method), so per-op costs are real.

Doors re-measured:
  1. Pallas DP kernel vs the XLA scan DP ("10x slower", round 3).
  2. Wide-band blocked DP vs the scan ("20x slower", round 3).
  3. Edge-CSR upload ("neutral", round 3) — wire format, re-measured
     as the dense-arena vs edge-arena program cost (upload excluded:
     both ride the same link; the question is device-side cost).

Device-side realign (0.47x, round 4) is a pipeline-level result (its
cost is tunnel dispatch, not kernel time) — re-measured separately via
tools/prof_align_dev.py if needed.

    python tools/rebench_doors.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

K = 8
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
        print(f"{name:44s} FAILED: {type(e).__name__} {str(e)[:100]}",
              flush=True)
        return None
    ts = []
    for _ in range(reps):
        t0 = time.time()
        _ = np.asarray(f(x0, *extra))
        ts.append(time.time() - t0)
    t = (min(ts) - FLOOR) / iters * 1000
    print(f"{name:44s} {t:8.3f} ms/op", flush=True)
    return t


def main():
    global FLOOR
    rng = np.random.default_rng(0)
    B, V, W, Kl = 128, 5632, 64, 32

    x = jnp.asarray(rng.integers(0, 100, (B, 256)), dtype=jnp.int32)
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

    # Bench-shaped band: ~3 live lanes per node, spans 1..W.
    win = np.full((B, V, W), -1, np.int32)
    lanes = rng.integers(0, W, (B, V, 3))
    cnts = rng.integers(1, 30, (B, V, 3)).astype(np.int32)
    for j in range(3):
        np.put_along_axis(win, lanes[:, :, j:j+1], cnts[:, :, j:j+1], 2)
    win = jnp.asarray(win)
    exit_c = jnp.asarray(
        np.where(rng.random((B, V)) < 0.01,
                 rng.integers(1, 30, (B, V)), -1).astype(np.int32)
    )
    cov = jnp.asarray(rng.integers(1, 30, (B, V)), dtype=jnp.int32)
    unsup = jnp.asarray(rng.random((B, V)) < 0.02)
    lu = jnp.asarray(
        np.sort(rng.integers(0, V, (B, Kl)))[:, ::-1].copy(), dtype=jnp.int32
    )
    lw = jnp.minimum(lu + W + 10, V - 1)
    lesc = jnp.asarray(rng.random((B, Kl)), dtype=jnp.float32) * 5

    from pbdagcon_tpu.ops import dp, dp_blocked, dp_pallas

    def dep(win, s):  # data-dependence that never changes values
        bad = jnp.isnan(jnp.sum(s))
        return jnp.where(bad, win + 1, win)

    def run_xla(w, *e):
        s = dp.dp_scores(w, *e)
        return dep(w, s)

    t_xla = chain("DP xla scan [128,5632,64]", run_xla, win,
                  (exit_c, cov, unsup, lu, lw, lesc))

    def run_pallas(w, *e):
        s = dp_pallas.dp_scores_pallas(w, *e)
        return dep(w, s)

    t_pal = chain("DP pallas kernel [128,5632,64]", run_pallas, win,
                  (exit_c, cov, unsup, lu, lw, lesc))

    def run_blocked(w, *e):
        s, fb = dp_blocked.dp_scores_blocked(w, *e)
        return dep(w, s)

    t_blk = chain("DP blocked int32 [128,5632,64]", run_blocked, win,
                  (exit_c, cov, unsup, lu, lw, lesc))

    for tile in (128, 256):
        def run_pal_t(w, *e, _t=tile):
            s = dp_pallas.dp_scores_pallas(*((w,) + e), tile_v=_t)
            return dep(w, s)

        chain(f"DP pallas tile_v={tile}", run_pal_t, win,
              (exit_c, cov, unsup, lu, lw, lesc))

    if t_xla and t_pal:
        print(f"\npallas/xla ratio: {t_pal/t_xla:.2f}x "
              f"({'pallas WINS - door reopened' if t_pal < t_xla else 'xla still wins'})")
    if t_xla and t_blk:
        print(f"blocked/xla ratio: {t_blk/t_xla:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
