"""Device mesh + sharded consensus DP + collective metrics.

Targets are embarrassingly parallel, so the mesh is one axis
("targets") and the DP batch dimension is sharded across it — XLA
partitions the reverse scan with zero communication. Collectives only
appear in `metrics_allreduce` (global throughput counters, psum over the
mesh) per the north star's "per-column vote tensors and path scores
combined via ICI collectives" for the metrics/aggregation path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pbdagcon_tpu.ops.dp import dp_scores


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first `n_devices` devices, axis 'targets'."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("targets",))


def _pad_batch_to(arrs: dict, mult: int) -> tuple[dict, int]:
    """Pad the batch dim to a multiple of the mesh size (dummy targets
    have no edges; their scores are ignored)."""
    B = arrs["win_count"].shape[0]
    rem = (-B) % mult
    if rem == 0:
        return arrs, B
    out = {}
    for k, v in arrs.items():
        if k == "n":
            out[k] = np.concatenate([v, np.zeros(rem, v.dtype)])
            continue
        pad = np.zeros((rem,) + v.shape[1:], dtype=v.dtype)
        if k in ("win_count", "exit_count", "long_u", "long_w"):
            pad[:] = -1
        if k == "long_esc":
            pad[:] = np.float32(-np.inf)
        out[k] = np.concatenate([v, pad], axis=0)
    return out, B


def dp_scores_sharded(batch: dict, mesh: Mesh) -> np.ndarray:
    """Run the batched DP with the batch dimension sharded over `mesh`.

    `batch` is `ops.dp.pad_batch` output. Returns scores [B, V] f32
    (unpadded). Single-host multi-chip: one device_put per shard, one
    program launch, no cross-device traffic in the scan itself.
    """
    nshards = mesh.devices.size
    batch, B = _pad_batch_to(batch, nshards)
    sharding = NamedSharding(mesh, P("targets"))

    args = [
        jax.device_put(jnp.asarray(batch[k]), sharding)
        for k in ("win_count", "exit_count", "cov", "unsup",
                  "long_u", "long_w", "long_esc")
    ]
    out = jax.jit(
        dp_scores, out_shardings=sharding
    )(*args)
    return np.asarray(out)[:B]


@functools.partial(jax.jit, static_argnames=("mesh",))
def _psum_counters(counters: jax.Array, mesh: Mesh) -> jax.Array:
    return jax.shard_map(
        lambda c: jax.lax.psum(c, "targets"),
        mesh=mesh,
        in_specs=P("targets"),
        out_specs=P(),
    )(counters)


def metrics_allreduce(per_host_counters: np.ndarray, mesh: Mesh) -> np.ndarray:
    """Global sum of int64/float counters across the mesh (psum on ICI).

    Each mesh slot contributes one row of counters; returns the summed
    row. In single-process tests the rows are the virtual devices'."""
    c = jnp.asarray(per_host_counters)
    if c.ndim == 1:
        c = jnp.tile(c[None, :], (mesh.devices.size, 1))
        c = c.at[1:].set(0)  # only slot 0 carries this host's counters
    out = np.asarray(_psum_counters(c, mesh))
    return out.reshape(out.shape[-1])
