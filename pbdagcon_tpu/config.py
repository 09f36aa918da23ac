"""Run configuration mirroring the reference `dagcon` CLI semantics.

Reference flags (reconstructed from `src/cpp/main.cpp`, SURVEY.md §2 C6):
`-c` min coverage/weight (default 8), `-m` min consensus length (default
500), `-j` worker threads (default 4), `-t` end-trim (default 0). Names and
defaults are preserved so behaviour is comparable; TPU-specific knobs are
additive.
"""

from __future__ import annotations

import dataclasses
import os


def enable_compile_cache() -> None:
    """Point JAX at a persistent compilation cache (idempotent).

    The devbuild backend compiles one program per shape-ladder
    combination (minutes cold through a tunneled backend); the cache
    makes that a one-time cost across processes. Directory from
    DAGCON_JAX_CACHE (value "0" or "" disables), default
    ~/.cache/pbdagcon-tpu/jax."""
    default = os.path.join(
        os.path.expanduser("~"), ".cache", "pbdagcon-tpu", "jax"
    )
    path = os.environ.get("DAGCON_JAX_CACHE", default)
    if not path or path == "0":
        return
    # "1" means "enabled" (use the default dir), not a relative directory
    # named 1/ — that once landed a binary cache blob inside the repo.
    if path == "1":
        path = default
    try:
        import jax

        if jax.config.jax_compilation_cache_dir != path:
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:  # pragma: no cover - cache is best-effort
        pass


@dataclasses.dataclass(frozen=True)
class DagconConfig:
    # Reference-equivalent knobs (dagcon -c / -m / -j / -t).
    min_weight: int = 8
    min_length: int = 500
    threads: int = 4
    trim: int = 0

    # Input format: "m5" (blasr -m 5) or "pre" (HGAP m4topre records).
    fmt: str = "m5"
    # Re-align raw (ungapped) q/t pairs before graph building — the
    # reference `dagcon -a` path over unaligned 'pre' records (SPEC §1.5).
    align: bool = False
    # Where -a alignment runs: "host" (threaded C++ banded DP) or
    # "device" (batched TPU kernel, ops/align_tpu.py). Host currently
    # wins on this tunnel (device traceback gathers dominate); both are
    # exact.
    align_backend: str = "host"
    # -a scorer: "simple" (SPEC §1.5 linear-gap 1/-2/-3, the default the
    # whole differential stack is pinned to) or "affine" (SPEC §1.6
    # Gotoh). The reference wraps blasr_libcpp's guided affine aligner
    # whose parameters are unreadable (mount empty); the affine option +
    # docs/SCORER_SENSITIVITY.md quantify how much the consensus depends
    # on that choice.
    align_scorer: str = "simple"
    # (match, mismatch, open, extend) for align_scorer="affine"; a gap
    # of length k scores open + (k-1)*extend.
    affine_params: tuple[int, int, int, int] = (1, -2, -4, -1)

    # --- TPU execution knobs ---
    # Bucket ladders for padded shapes (nodes V, successor window W).
    v_buckets: tuple[int, ...] = (256, 512, 1024, 2048, 4096, 8192, 16384)
    w_buckets: tuple[int, ...] = (16, 32, 64, 128)
    # Max targets per device batch (per V-bucket batches are formed up to
    # this size before dispatch).
    batch_targets: int = 128
    # Execution backend: "xla" (host graph build + device scan DP),
    # "blocked" (max-plus blocked solve, sqrt(V) depth, guarded exact),
    # "pallas", "host", "devbuild" (graph build + merge + DP +
    # backtrack all on device, host fallback for flagged targets),
    # "hybrid" (host engine and devbuild pipeline run concurrently on
    # group-aligned chunks with rate-adaptive work stealing), or
    # "auto"; host fallback for out-of-bucket targets always.
    backend: str = "auto"
    # Use the native C++ loader/graph engine when available.
    use_native: bool = True

    # --- transfer-link knobs (platform-probed defaults) ---
    # Cap on any single host->device transfer, in bytes. Tunneled
    # backends (axon) hang on transfers over ~64MB and move ~45MB/s, so
    # dispatches are split to stay under this; on directly-attached
    # devices the cap can be raised freely. 0 = probe from the platform
    # (tunneled/experimental platforms get the conservative cap).
    transfer_cap_bytes: int = 0
    # Feed-chunk size for the streaming loader, in MB (DAGCON_CHUNK_MB
    # env overrides).
    chunk_mb: int = 16
    # Upload graph batches as edge-CSR streams (~10x less transfer, but
    # the device scatter program compiles slowly on tunneled backends);
    # DAGCON_EDGE_UPLOAD=1 env also enables.
    edge_upload: bool = False

    def resolved_transfer_cap(self) -> int:
        if self.transfer_cap_bytes > 0:
            return self.transfer_cap_bytes
        try:
            import jax

            plat = jax.devices()[0].platform
        except Exception:  # pragma: no cover - no devices
            return 48_000_000
        # tunneled/experimental platforms report "tpu" via the axon
        # plugin but enumerate exactly one device behind a proxy; use
        # the conservative cap there and a large one for local backends.
        if plat == "cpu":
            return 1 << 30
        return 48_000_000

    def __post_init__(self) -> None:
        if self.fmt not in ("m5", "pre"):
            raise ValueError(f"fmt must be 'm5' or 'pre', got {self.fmt!r}")
        if self.align_backend not in ("host", "device"):
            raise ValueError(f"unknown align_backend {self.align_backend!r}")
        if self.align_scorer not in ("simple", "affine"):
            raise ValueError(f"unknown align_scorer {self.align_scorer!r}")
        if self.align_scorer == "affine":
            m, x, o, e = self.affine_params
            if not (m >= 0 and x <= 0 and o <= e <= 0):
                raise ValueError(
                    "affine_params must satisfy match>=0, mismatch<=0, "
                    f"open<=extend<=0; got {self.affine_params}"
                )
            if self.align_backend == "device":
                raise ValueError(
                    "align_backend='device' implements the simple scorer "
                    "only; use align_backend='host' with align_scorer="
                    "'affine'"
                )
        if self.backend not in (
            "auto", "xla", "blocked", "pallas", "host", "devbuild",
            "hybrid",
        ):
            raise ValueError(f"unknown backend {self.backend!r}")
        if self.min_weight < 0 or self.min_length < 0 or self.trim < 0:
            raise ValueError("min_weight/min_length/trim must be >= 0")
