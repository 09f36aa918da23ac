"""Does the tunnel pipeline? Time N back-to-back devbuild dispatches
with the fetch at the end: if dispatch is async and the device queues
work, wall(N dispatches + 1 fetch) << N * wall(1 dispatch + fetch).

    python tools/prof_overlap.py [n_batches]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> int:
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_targets, length, cov = 128, 1000, 30

    import jax
    import jax.numpy as jnp

    from pbdagcon_tpu import native
    from pbdagcon_tpu.devpipe import (
        DevCapsConfig, _B_LADDER, _C_LADDER, _L_LADDER, _R_LADDER,
        _ladder, caps_for, ins_cap,
    )
    from pbdagcon_tpu.ops import devemit
    from pbdagcon_tpu.ops.devbuild_jax import device_build
    from pbdagcon_tpu.ops.dp import dp_scores
    from pbdagcon_tpu.simulate import NoiseProfile, simulate_targets, to_pre_raw

    print(f"platform={jax.devices()[0].platform}", file=sys.stderr)
    assert native.ensure_built()
    lines = []
    for _tid, _bb, alns in simulate_targets(
        1234, n_targets, length, cov, NoiseProfile()
    ):
        lines.extend(to_pre_raw(a) for a in alns)
    text = ("\n".join(lines) + "\n").encode()
    eng = native.NativeEngine(
        min_weight=max(2, cov // 4), min_length=100, threads=4, align=True
    )
    count = eng.encode_text(text, fmt="pre", flush=True)
    metas = eng.enc_metas(count)
    dcfg = DevCapsConfig.heavy()
    Rb = _ladder(int(metas[:, 0].max()), _R_LADDER)
    Cb = _ladder(int(metas[:, 1].max()), _C_LADDER)
    Lb = _ladder(int(metas[:, 2].max()), _L_LADDER)
    caps = caps_for(
        128, Rb, Cb, Lb, dcfg,
        ch_need=int(metas[:, 5].max()), sm_need=int(metas[:, 6].max()),
        nd_need=int(metas[:, 3].max()),
    )
    NI = ins_cap(caps)
    part = [i for i in range(count) if int(metas[i, 3]) <= NI][: caps.B]
    ops, starts, bbuf, ins, Lrr = eng.enc_fill(
        part, caps.R, caps.C, caps.L, NI, B=caps.B
    )
    P = min(caps.V, 2 * caps.L + 64)

    @jax.jit
    def dp_emit(build, mw):
        scores = dp_scores(
            build["win"], build["exit_cnt"], build["cov"],
            build["unsup"], build["long_u"], build["long_w"],
            build["long_esc"],
        )
        e = devemit.backtrack_emit(build, scores, mw, P)
        e["flags"] = build["flags"]
        return e

    def one(sync: bool):
        d = tuple(
            jnp.asarray(a) for a in (ops, starts, bbuf, ins, Lrr)
        )
        b = device_build(*d, caps)
        e = dp_emit(b, jnp.int32(7))
        if sync:
            jax.block_until_ready(e)
        return e

    # warm / compile
    jax.block_until_ready(one(True))

    t0 = time.time()
    e = one(True)
    t_one = time.time() - t0
    print(f"1 batch, synced: {t_one*1000:.0f} ms", file=sys.stderr)

    t0 = time.time()
    outs = []
    for k in range(nb):
        td = time.time()
        outs.append(one(False))
        print(f"  dispatch {k}: {(time.time()-td)*1000:.0f} ms",
              file=sys.stderr)
    t_disp = time.time() - t0
    jax.block_until_ready(outs)
    t_all = time.time() - t0
    print(
        f"{nb} batches: dispatch wall {t_disp*1000:.0f} ms, "
        f"total {t_all*1000:.0f} ms "
        f"(serial would be {nb*t_one*1000:.0f} ms; "
        f"overlap factor {nb*t_one/t_all:.2f}x)",
        file=sys.stderr,
    )
    eng.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
