"""Measure the device path (backend=xla) with dense vs edge-CSR upload
on the TPU bench workload. The dense win band is ~46 MB/batch through a
~45 MB/s tunnel; the CSR arena is ~10x smaller. With the persistent
compile cache the scatter program's AOT cost is one-time."""
import io
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

try:  # persistent cache: the CSR scatter AOT compile is minutes once
    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from pbdagcon_tpu import native
from pbdagcon_tpu.config import DagconConfig
from pbdagcon_tpu.io import FastaWriter
from pbdagcon_tpu.pipeline import run_stream
from pbdagcon_tpu.simulate import NoiseProfile, simulate_targets, to_pre_raw

n_targets, length, cov = 512, 1000, 30
lines = []
for _t, _b, alns in simulate_targets(1234, n_targets, length, cov, NoiseProfile()):
    lines.extend(to_pre_raw(a) for a in alns)
text = ("\n".join(lines) + "\n").encode()
assert native.ensure_built()

for edge in (False, True):
    cfg = DagconConfig(
        min_weight=max(2, cov // 4), min_length=100,
        threads=os.cpu_count() or 4, backend="xla", fmt="pre", align=True,
        batch_targets=512, v_buckets=(5632,), w_buckets=(16, 32, 64),
        edge_upload=edge,
    )
    outs = []
    t0 = time.time()
    out = io.StringIO()
    run_stream(io.TextIOWrapper(io.BytesIO(text)), FastaWriter(out), cfg)
    print(f"edge={edge} warmup {time.time()-t0:.1f}s", flush=True)
    outs.append(out.getvalue())
    best = None
    for rep in range(3):
        out = io.StringIO()
        t = time.time()
        run_stream(io.TextIOWrapper(io.BytesIO(text)), FastaWriter(out), cfg)
        dt = time.time() - t
        best = dt if best is None else min(best, dt)
        print(f"edge={edge} run{rep}: {dt:.2f}s", flush=True)
        outs.append(out.getvalue())
    assert all(o == outs[0] for o in outs), "parity broke across runs"
    bases = sum(len(l) for l in outs[0].splitlines() if not l.startswith(">"))
    print(f"edge={edge}: best {best:.2f}s = {bases/best:,.0f} b/s", flush=True)
