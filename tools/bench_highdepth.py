"""High-depth benchmark (BASELINE config #3: 100-500x coverage): device
paths vs the single-core host engine, parity-checked.

    python tools/bench_highdepth.py [cov] [n_targets] [L]
"""
import io as _io
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> int:
    cov = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    n_targets = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    length = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

    from pbdagcon_tpu import native
    from pbdagcon_tpu.config import DagconConfig
    from pbdagcon_tpu.io import FastaWriter
    from pbdagcon_tpu.pipeline import run_stream
    from pbdagcon_tpu.simulate import NoiseProfile, simulate_targets, to_pre_raw

    lines = []
    for _tid, _bb, alns in simulate_targets(
        4321, n_targets, length, cov, NoiseProfile()
    ):
        lines.extend(to_pre_raw(a) for a in alns)
    text = ("\n".join(lines) + "\n").encode()
    print(
        f"highdepth: {n_targets} targets x {length}bp x {cov}x "
        f"({len(text)/1e6:.0f} MB)", file=sys.stderr,
    )
    mw = max(2, cov // 4)
    assert native.ensure_built()

    def run(backend, threads=4, reps=1):
        best = None
        fa = None
        for _ in range(reps):
            buf = _io.StringIO()
            cfg = DagconConfig(
                fmt="pre", align=True, min_weight=mw, min_length=100,
                backend=backend, use_native=True, threads=threads,
            )
            t0 = time.time()
            run_stream(_io.BytesIO(text), FastaWriter(buf), cfg)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            fa = buf.getvalue()
        bases = sum(
            len(l) for l in fa.splitlines() if not l.startswith(">")
        )
        return fa, bases, best

    fa_h, bases, t_h = run("host", threads=1)
    print(
        f"highdepth: host 1-core {bases/t_h:,.0f} b/s ({t_h:.1f}s, "
        f"{bases} bases)", file=sys.stderr,
    )
    for backend in ("xla", "devbuild"):
        try:
            fa_d, bases_d, t_d = run(backend, reps=2)
            parity = "OK" if fa_d == fa_h else "MISMATCH"
            print(
                f"highdepth: {backend} {bases_d/t_d:,.0f} b/s "
                f"({t_d:.1f}s) vs 1-core = {t_h/t_d:.2f}x parity={parity}",
                file=sys.stderr,
            )
            if parity != "OK":
                return 1
        except Exception as e:
            print(f"highdepth: {backend} failed: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
