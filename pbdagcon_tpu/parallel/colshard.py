"""Column-sharded consensus DP for extreme backbones (sequence-parallel
analogue).

The only long-sequence axis this workload has is one target's backbone
(SURVEY.md §5): a single multi-megabase backbone overflows one device's
useful occupancy and the per-target batch model. This mode shards the
*linearized node axis* of ONE target across the mesh and runs the
banded max-plus DP with device-local work plus a single boundary-vector
chain over the ring:

1. each device composes its local rows into one max-plus transfer
   matrix over the augmented band state (parallel across devices);
2. boundary vectors propagate right-to-left through the D devices via
   `ppermute` (D sequential hops — the halo exchange);
3. every device fills its interior scores locally in parallel.

Exactness follows the blocked-DP argument (ops/dp_blocked.py): the
algebra runs in **int32 half-units**, where reassociation is exact by
construction; `blocked_safe` bounds keep real sums within int32 and
separated from the -inf sentinel, and the caller checks the returned
scores against the f32-parity line (all |2s| < 2^24 - 2^17 so the f32
spec scan provably computes the same values). Targets with long edges
(span > W) are not eligible here and take the single-device path (the
caller checks `lin.span`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pbdagcon_tpu.ops.dp_blocked import (
    _F32_LIMIT,
    _REAL_MIN,
    SENT,
    _esc2_dense,
)

NEG_INF = np.float32(-np.inf)


def _compose_local(a_rows: jax.Array, Wp: int, axis: str | None = None) -> jax.Array:
    """Compose companion-row transfer matrices over local rows (top row
    first): M = A_0 (x) A_1 (x) ... (x) A_{L-1}. [L, Wp] -> [Wp, Wp]."""
    eye = jnp.full((Wp, Wp), SENT, jnp.int32)
    eye = eye.at[jnp.arange(Wp), jnp.arange(Wp)].set(0)
    if axis is not None:  # inside shard_map: mark carry device-varying
        eye = jax.lax.pcast(eye, (axis,), to="varying")

    def compose(M, a):
        row0 = jnp.maximum(jnp.max(a[:, None] + M, axis=0), SENT)  # [Wp]
        return (
            jnp.concatenate(
                [row0[None, :], M[0 : Wp - 2, :], M[Wp - 1 :, :]], axis=0
            ),
            None,
        )

    M, _ = jax.lax.scan(compose, eye, a_rows, reverse=True)
    return M


@functools.partial(jax.jit, static_argnames=("mesh", "axis"))
def _colsharded_scores(a_rows: jax.Array, mesh: Mesh, axis: str):
    """a_rows [V, Wp] int32 half-units (esc rows + exit column), V
    sharded over `axis`. Returns half-unit scores [V] int32 with the
    same sharding."""
    D = mesh.shape[axis]
    Wp = a_rows.shape[1]
    W = Wp - 1

    def local(a_local: jax.Array) -> jax.Array:
        # a_local: [V/D, Wp]
        my = jax.lax.axis_index(axis)
        M = _compose_local(a_local, Wp, axis=axis)

        # Boundary chain: x starts below the LAST shard and hops left.
        x0 = jnp.full((Wp,), SENT, jnp.int32).at[W].set(0)
        x0 = jax.lax.pcast(x0, (axis,), to="varying")

        # After i hops, shard D-1-i has received its incoming boundary.
        # Iterate D times so shard 0's boundary settles too; but we
        # need each shard's INCOMING boundary x_in (the vector *before*
        # its own transfer) — capture it when it arrives.
        def scan_hop(carry, i):
            x, x_in = carry
            active = my == (D - 1 - i)
            x_in = jnp.where(active, x, x_in)
            x_out = jnp.where(
                active,
                jnp.maximum(jnp.max(M + x[None, :], axis=1), SENT),
                x,
            )
            x_next = jax.lax.ppermute(
                x_out, axis, [(d, (d - 1) % D) for d in range(D)]
            )
            take = my == (D - 2 - i) % D
            return (jnp.where(take, x_next, x), x_in), None

        x_in0 = jax.lax.pcast(
            jnp.full((Wp,), SENT, jnp.int32), (axis,), to="varying"
        )
        (x_final, x_in), _ = jax.lax.scan(
            scan_hop, (x0, x_in0), jnp.arange(D, dtype=jnp.int32)
        )
        del x_final

        # Interior fill from the incoming boundary (top of the shard
        # below): win[d] = score[local_end + 1 + d].
        win0 = x_in[:W]

        def fill(win, a):
            cand = jnp.concatenate([a[:W] + win, a[W:]], axis=0)
            s = jnp.maximum(jnp.max(cand), SENT)
            return jnp.concatenate([s[None], win[: W - 1]]), s

        _, ys = jax.lax.scan(fill, win0, a_local, reverse=True)
        return ys  # [V/D]

    return jax.shard_map(
        local, mesh=mesh, in_specs=P(axis), out_specs=P(axis)
    )(a_rows)


def colsharded_scores(
    win_count: np.ndarray,  # [V, W] int16/int32, -1 = none (ONE target)
    exit_count: np.ndarray,  # [V]
    cov: np.ndarray,  # [V]
    unsup: np.ndarray,  # [V] bool
    mesh: Mesh,
    axis: str = "targets",
) -> np.ndarray:
    """Column-sharded DP scores for one target, f32 (bitwise equal to
    the sequential f32 scan). The caller guarantees no long edges
    (lin.span <= W) and `blocked_safe` bounds. Raises OverflowError if
    any score crosses the f32-parity line (caller falls back to the
    exact host path)."""
    D = mesh.shape[axis]
    V, W = win_count.shape
    Vp = -(-V // D) * D
    esc2, e_exit2 = _esc2_dense(
        jnp.asarray(win_count)[None],
        jnp.asarray(exit_count)[None],
        jnp.asarray(cov)[None],
        jnp.asarray(unsup)[None],
    )
    a_rows = jnp.concatenate([esc2[0], e_exit2[0][:, None]], axis=1)
    if Vp != V:
        pad = jnp.full((Vp - V, W + 1), SENT, jnp.int32)
        a_rows = jnp.concatenate([a_rows, pad], axis=0)
    sharding = NamedSharding(mesh, P(axis))
    a_rows = jax.device_put(a_rows, sharding)
    s2 = np.asarray(_colsharded_scores(a_rows, mesh=mesh, axis=axis))[:V]
    finite = s2 > _REAL_MIN
    if bool((finite & (np.abs(s2) >= _F32_LIMIT)).any()):
        raise OverflowError("colshard scores beyond the f32-parity line")
    return np.where(finite, s2.astype(np.float32) * 0.5, NEG_INF)
