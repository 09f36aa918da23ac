"""Blocked max-plus consensus DP: O(sqrt(V)) sequential depth, bit-exact.

The direct reverse scan (`dp.dp_scores`) runs V sequential steps of tiny
work — latency-bound on TPU (each step is ~[B, W] elements). This module
reformulates the same recurrence as **max-plus linear algebra** so the
chain shortens to ~L + V/L + L steps of large dense work:

  state  x_u = [s[u], .., s[u+W-1], 0]  (affine max-plus vector)
  step   x_u = A_u (x) x_{u+1}          (companion-style band matrix;
                                         row 0 = [esc[u,:], e_exit[u]])

1. **Build** per-block transfer matrices M_g = A_{gL} (x) ... (x)
   A_{gL+L-1}: L sequential steps, all V/L blocks in parallel; each step
   is one max-plus row update (a (W+1)^2 tensor op over [B, G]).
2. **Propagate** boundary vectors sequentially through the V/L blocks
   (max-plus matrix-vector, trivial work).
3. **Fill** interior scores by running the direct recurrence inside
   every block simultaneously from its boundary vector (L steps of
   [B, G, W] work).

Bit-exactness: max-plus reassociates additions, which is only safe when
every candidate path sum is exactly representable in float32. All edge
scores are multiples of 0.5 with |esc| <= depth, so any partial sum of
<= V terms is exact iff V * max(|esc|, 10) < 2^22 (halves exact to
2^23). `blocked_safe` checks that bound host-side; unsafe targets take
the sequential scan. -inf propagates cleanly (never summed with +inf).

Long edges (span > W) break the banded structure, so they are resolved
by monotone Kleene iteration: solve the band system, then check each
long edge's candidate `lesc + s[w] > s[u]`; if none is active the band
solution IS the full solution (induction from the topological end — the
first differing node would need an active long edge). Active targets
re-solve with the long candidates injected as constants, converging
from below to the exact fixed point; bitwise-stable iteration ends the
loop (sequential-scan fallback after `max_iters`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pbdagcon_tpu.ops.dp import dp_scores

NEG_INF = np.float32(-np.inf)
_PENALTY = np.float32(-10.0)


def _esc_dense(win_count, exit_count, cov, unsup):
    """esc[b,u,d] f32 and e_exit[b,u] f32 from the packed arrays."""
    B, V, W = win_count.shape
    win_count = win_count.astype(jnp.int32)
    idx = (
        jnp.arange(V, dtype=jnp.int32)[:, None]
        + 1
        + jnp.arange(W, dtype=jnp.int32)[None, :]
    )  # [V, W] target node ids
    idx = jnp.minimum(idx, V - 1)
    cov_w = jnp.take(cov.astype(jnp.float32), idx, axis=1)  # [B, V, W]
    unsup_w = jnp.take(unsup, idx, axis=1)  # [B, V, W]
    esc = jnp.where(
        win_count >= 0,
        jnp.where(unsup_w, _PENALTY, win_count.astype(jnp.float32) - 0.5 * cov_w),
        NEG_INF,
    )
    e_exit = jnp.where(
        exit_count >= 0, exit_count.astype(jnp.float32), NEG_INF
    )
    return esc, e_exit


@functools.partial(jax.jit, static_argnames=("L",))
def _solve_band(esc, e_exit, L=64):
    """Exact banded solve via blocked max-plus; returns scores [B, V]."""
    B, V, W = esc.shape
    assert V % L == 0
    G = V // L
    Wp = W + 1

    # a[b, u, :] = [esc row, e_exit] — row 0 of A_u.
    a = jnp.concatenate([esc, e_exit[..., None]], axis=-1)  # [B, V, Wp]
    a_blk = a.reshape(B, G, L, Wp)

    # ---- Phase 1: block transfer matrices.
    eye = jnp.full((Wp, Wp), NEG_INF, jnp.float32)
    eye = eye.at[jnp.arange(Wp), jnp.arange(Wp)].set(0.0)
    M0 = jnp.broadcast_to(eye, (B, G, Wp, Wp))

    def compose(M, t):
        at = a_blk[:, :, L - 1 - t, :]  # [B, G, Wp]
        row0 = jnp.max(at[..., :, None] + M, axis=-2)  # [B, G, Wp]
        M = jnp.concatenate(
            [row0[..., None, :], M[..., 0 : W - 1, :], M[..., W:Wp, :]],
            axis=-2,
        )
        return M, None

    M, _ = jax.lax.scan(compose, M0, jnp.arange(L, dtype=jnp.int32))

    # ---- Phase 2: boundary vectors, sequential over blocks (reverse).
    x_init = jnp.full((B, Wp), NEG_INF, jnp.float32).at[:, W].set(0.0)

    def prop(x, Mg):
        # Mg: [B, Wp, Wp]; x entering = boundary of the NEXT block.
        x_out = jnp.max(Mg + x[:, None, :], axis=-1)  # [B, Wp]
        return x_out, x  # emit the incoming boundary (block g's input)

    _, x_in = jax.lax.scan(
        prop, x_init, jnp.moveaxis(M, 1, 0), reverse=True
    )  # x_in[g] = x_{(g+1)L}  [G, B, Wp]
    x_in = jnp.moveaxis(x_in, 0, 1)  # [B, G, Wp]

    # ---- Phase 3: interior fill, all blocks in parallel.
    win0 = x_in[..., :W]  # [B, G, W] score windows below each block

    def fill(win, t):
        at = a_blk[:, :, L - 1 - t, :]  # [B, G, Wp]
        s = jnp.max(
            jnp.concatenate([at[..., :W] + win, at[..., W:]], axis=-1),
            axis=-1,
        )  # [B, G]
        win = jnp.concatenate([s[..., None], win[..., : W - 1]], axis=-1)
        return win, s

    _, ys = jax.lax.scan(fill, win0, jnp.arange(L, dtype=jnp.int32))
    # ys[t, b, g] = s[gL + (L-1-t)] -> reorder to [B, V].
    ys = jnp.moveaxis(ys, 0, 2)  # [B, G, L] with L axis reversed
    return ys[:, :, ::-1].reshape(B, V)


@functools.partial(jax.jit, static_argnames=("L", "max_iters"))
def dp_scores_blocked(
    win_count: jax.Array,  # [B, V, W] int16/int32
    exit_count: jax.Array,  # [B, V] int16/int32
    cov: jax.Array,  # [B, V] int16/int32
    unsup: jax.Array,  # [B, V] bool
    long_u: jax.Array,  # [B, K] int32 (-1 pad)
    long_w: jax.Array,  # [B, K] int32
    long_esc: jax.Array,  # [B, K] float32
    L: int = 64,
    max_iters: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """Blocked DP with long-edge Kleene iteration.

    Returns (scores [B, V] f32, unconverged [B] bool). Unconverged rows
    (still-active long edges after `max_iters`) must take the
    sequential path — exactness is never silently sacrificed."""
    B, V, W = win_count.shape
    esc, e_exit = _esc_dense(win_count, exit_count, cov, unsup)
    valid = long_u >= 0
    lu = jnp.where(valid, long_u, 0)
    lw = jnp.where(valid, long_w, 0)

    def body(state):
        _s, e_ex, it, _active = state
        s = _solve_band(esc, e_ex, L=L)
        cand = jnp.where(
            valid, long_esc + jnp.take_along_axis(s, lw, axis=1), NEG_INF
        )  # [B, K]
        active = cand > jnp.take_along_axis(s, lu, axis=1)
        # Inject active candidates as constants for the next round
        # (monotone: keep previous injections via max with e_ex).
        extra = jnp.full((B, V), NEG_INF, jnp.float32)
        extra = extra.at[
            jnp.arange(B)[:, None], lu
        ].max(jnp.where(active, cand, NEG_INF))
        e_ex_next = jnp.maximum(e_ex, extra)
        return s, e_ex_next, it + 1, jnp.any(active, axis=1)

    def cond(state):
        _s, _e, it, active = state
        return jnp.logical_and(it < max_iters, jnp.any(active))

    s0 = jnp.zeros((B, V), jnp.float32)
    state = (s0, e_exit, jnp.int32(0), jnp.ones((B,), bool))
    state = jax.lax.while_loop(cond, body, state)
    s, _e, it, active = state
    return s, active


def blocked_safe(max_abs_esc: float, v: int) -> bool:
    """True if every path partial sum is exactly representable in f32,
    making max-plus reassociation bit-safe (see module docstring)."""
    return v * max(abs(max_abs_esc), 10.0) < float(1 << 22)
