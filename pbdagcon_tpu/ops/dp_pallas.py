"""Pallas TPU kernel for the consensus best-path DP.

Same recurrence as `dp.dp_scores` (reverse banded max-plus scan with a
long-edge register file — SPEC.md §3.2, re-architecting the reference's
`AlnGraphBoost::consensus()` topological DP, SURVEY.md §3.4), hand-laid
for the TPU memory system:

- layout puts the batch on the 128-lane axis and the band window W on
  sublanes, so every scan step is a handful of (W, 128) VPU ops plus a
  sublane max-reduction;
- the V (node) axis streams through VMEM in reverse-ordered grid tiles;
  rolling score/attribute windows and the long-edge pending registers
  live in VMEM scratch that persists across the tile loop, so HBM
  traffic is exactly one pass over the banded count tensor;
- Pallas double-buffers tile loads against compute automatically via
  the grid pipeline.

Bit-parity: identical float32 candidates and exact f32 max, so scores
are bitwise equal to `dp.dp_scores`, the host DP, and the graph oracle
(tests enforce all three). The kernel runs in interpreter mode on CPU
(tests) and compiled on TPU (bench).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = np.float32(-np.inf)
_PENALTY = np.float32(-10.0)

LANES = 128  # batch tile width (VPU lane count)


def _dp_kernel(
    win_ref,  # [TV, W, LANES] int16, -1 = no edge
    cov_ref,  # [TV, LANES] float32 (coverage of anchor, pre-cast)
    unsup_ref,  # [TV, LANES] int32 (0/1)
    exit_ref,  # [TV, LANES] float32 (esc of edge ->exit, -inf if none)
    lu_ref,  # [K, LANES] int32 long-edge source, -1 pad
    lw_ref,  # [K, LANES] int32 long-edge target
    lesc_ref,  # [K, LANES] float32 long-edge esc
    out_ref,  # [TV, LANES] float32 scores
    score_win,  # scratch [W, LANES] f32: score[u+1+d]
    cov_win,  # scratch [W, LANES] f32
    unsup_win,  # scratch [W, LANES] i32
    pend,  # scratch [K, LANES] f32: latched esc + score[w]
):
    vt = pl.program_id(1)
    n_vt = pl.num_programs(1)
    TV = win_ref.shape[0]
    W = win_ref.shape[1]

    @pl.when(vt == 0)
    def _init():
        score_win[:] = jnp.full(score_win.shape, NEG_INF, jnp.float32)
        cov_win[:] = jnp.zeros(cov_win.shape, jnp.float32)
        unsup_win[:] = jnp.zeros(unsup_win.shape, jnp.int32)
        pend[:] = jnp.full(pend.shape, NEG_INF, jnp.float32)

    # This tile covers global rows [tile_base, tile_base + TV), processed
    # in reverse; grid dim 1 iterates tiles high-to-low via index_map.
    # The row loop is FULLY UNROLLED with static indices: Mosaic
    # schedules the straight-line vector code ~4.5x faster than the
    # fori_loop + dynamic-slice form (measured 368 -> 80 ms on v5e).
    tile_base = (n_vt - 1 - vt) * TV
    sw = score_win[:]
    cw = cov_win[:]
    uw = unsup_win[:]
    pd = pend[:]
    lu = lu_ref[:]
    lw = lw_ref[:]
    le = lesc_ref[:]
    for r in range(TV - 1, -1, -1):
        i = tile_base + r  # global node index
        # int16 on the wire; widen before compare (v5e Mosaic has no
        # 16-bit vector cmp).
        wc = win_ref[r].astype(jnp.int32)  # [W, LANES]
        esc = jnp.where(
            wc >= 0,
            jnp.where(
                uw != 0,
                _PENALTY,
                wc.astype(jnp.float32) - 0.5 * cw,
            ),
            NEG_INF,
        )
        s = jnp.max(esc + sw, axis=0, keepdims=True)  # [1, LANES]
        s = jnp.maximum(s, exit_ref[r : r + 1, :])
        extra = jnp.max(
            jnp.where(lu == i, pd, NEG_INF), axis=0, keepdims=True
        )
        s = jnp.maximum(s, extra)
        pd = jnp.where(lw == i, le + s, pd)
        out_ref[r : r + 1, :] = s
        sw = jnp.concatenate([s, sw[: W - 1, :]], axis=0)
        cw = jnp.concatenate([cov_ref[r : r + 1, :], cw[: W - 1, :]], axis=0)
        uw = jnp.concatenate(
            [unsup_ref[r : r + 1, :], uw[: W - 1, :]], axis=0
        )
    score_win[:] = sw
    cov_win[:] = cw
    unsup_win[:] = uw
    pend[:] = pd


def _pad_to(x: np.ndarray | jax.Array, axis: int, mult: int, value):
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads, constant_values=value)


@functools.partial(jax.jit, static_argnames=("tv", "interpret"))
def _dp_pallas_jit(
    win_vwb: jax.Array,  # [V, W, B] int32
    cov_vb: jax.Array,  # [V, B] float32
    unsup_vb: jax.Array,  # [V, B] int32
    exit_vb: jax.Array,  # [V, B] float32
    lu_kb: jax.Array,  # [K, B] int32
    lw_kb: jax.Array,  # [K, B] int32
    lesc_kb: jax.Array,  # [K, B] float32
    tv: int,
    interpret: bool,
) -> jax.Array:
    V, W, B = win_vwb.shape
    K = lu_kb.shape[0]
    assert V % tv == 0 and B % LANES == 0
    n_bt = B // LANES
    n_vt = V // tv

    grid = (n_bt, n_vt)

    def vmap_idx(bt, vt):
        return (n_vt - 1 - vt, 0, bt)

    def vb_idx(bt, vt):
        return (n_vt - 1 - vt, bt)

    def kb_idx(bt, vt):
        return (0, bt)

    return pl.pallas_call(
        _dp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tv, W, LANES), vmap_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((tv, LANES), vb_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((tv, LANES), vb_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((tv, LANES), vb_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, LANES), kb_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, LANES), kb_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, LANES), kb_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tv, LANES), vb_idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((W, LANES), jnp.float32),
            pltpu.VMEM((W, LANES), jnp.float32),
            pltpu.VMEM((W, LANES), jnp.int32),
            pltpu.VMEM((K, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(win_vwb, cov_vb, unsup_vb, exit_vb, lu_kb, lw_kb, lesc_kb)


def dp_scores_pallas(
    win_count: np.ndarray | jax.Array,  # [B, V, W] int32
    exit_count: np.ndarray | jax.Array,  # [B, V] int32
    cov: np.ndarray | jax.Array,  # [B, V] int32
    unsup: np.ndarray | jax.Array,  # [B, V] bool
    long_u: np.ndarray | jax.Array,  # [B, K] int32
    long_w: np.ndarray | jax.Array,  # [B, K] int32
    long_esc: np.ndarray | jax.Array,  # [B, K] float32
    tile_v: int = 64,
    interpret: bool | None = None,
) -> jax.Array:
    """Pallas DP entry with the same contract as `dp.dp_scores`."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    win_count = jnp.asarray(win_count)
    B, V, W = win_count.shape
    tv = min(tile_v, max(8, V))

    exit_esc = jnp.where(
        jnp.asarray(exit_count) >= 0,
        jnp.asarray(exit_count).astype(jnp.float32),
        NEG_INF,
    )
    # Kernel layout: batch on lanes.
    win_vwb = _pad_to(
        _pad_to(jnp.transpose(win_count, (1, 2, 0)), 2, LANES, -1),
        0, tv, -1,
    )
    cov_vb = _pad_to(
        _pad_to(
            jnp.transpose(jnp.asarray(cov).astype(jnp.float32)), 1, LANES, 0
        ),
        0, tv, 0,
    )
    unsup_vb = _pad_to(
        _pad_to(
            jnp.transpose(jnp.asarray(unsup).astype(jnp.int32)), 1, LANES, 0
        ),
        0, tv, 0,
    )
    exit_vb = _pad_to(
        _pad_to(jnp.transpose(exit_esc), 1, LANES, NEG_INF), 0, tv, NEG_INF
    )
    lu_kb = _pad_to(
        _pad_to(jnp.transpose(jnp.asarray(long_u)), 1, LANES, -1), 0, 8, -1
    )
    lw_kb = _pad_to(
        _pad_to(jnp.transpose(jnp.asarray(long_w)), 1, LANES, -1), 0, 8, -1
    )
    lesc_kb = _pad_to(
        _pad_to(jnp.transpose(jnp.asarray(long_esc)), 1, LANES, NEG_INF),
        0, 8, NEG_INF,
    )
    scores_vb = _dp_pallas_jit(
        win_vwb, cov_vb, unsup_vb, exit_vb, lu_kb, lw_kb, lesc_kb,
        tv=int(tv), interpret=bool(interpret),
    )
    return jnp.transpose(scores_vb[:V, :B])  # [B, V]
