"""Multi-chip tests on the 8-device virtual CPU mesh: sharded DP parity,
manifest sharding, journal resume, bucket scheduler."""

import random

import numpy as np

import jax

from pbdagcon_tpu.alignment import normalize_gaps
from pbdagcon_tpu.oracle.graph import AlnGraph
from pbdagcon_tpu.ops.dp import choose_layout, pad_batch
from pbdagcon_tpu.ops.linearize import host_scores, linearize
from pbdagcon_tpu.parallel import (
    BucketScheduler,
    TargetJournal,
    dp_scores_sharded,
    make_mesh,
    metrics_allreduce,
    shard_for_host,
)
from pbdagcon_tpu.simulate import NoiseProfile, simulate_pileup


def _lins(seeds, length=120, cov=15):
    out = []
    for seed in seeds:
        rng = random.Random(seed)
        backbone, alns = simulate_pileup(
            rng, f"s{seed}", length, cov, NoiseProfile()
        )
        g = AlnGraph(backbone)
        for a in alns:
            g.add_aln(normalize_gaps(a))
        g.merge_nodes()
        out.append(linearize(g, sid=f"s{seed}"))
    return out


def test_sharded_dp_matches_host():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    lins = _lins(range(11))  # deliberately not divisible by 8
    V = 512
    W, K = choose_layout(lins)
    batch = pad_batch(lins, V, W, K)
    scores = dp_scores_sharded(batch, mesh)
    assert scores.shape[0] == 11
    for i, lin in enumerate(lins):
        np.testing.assert_array_equal(scores[i, : lin.n], host_scores(lin))


def test_metrics_allreduce():
    mesh = make_mesh()
    total = metrics_allreduce(np.array([3, 7], dtype=np.int64), mesh)
    np.testing.assert_array_equal(total, [3, 7])
    rows = np.arange(16, dtype=np.int64).reshape(8, 2)
    total = metrics_allreduce(rows, mesh)
    np.testing.assert_array_equal(total, rows.sum(axis=0))


def test_shard_for_host_partition():
    items = list(range(20))
    shards = [
        list(shard_for_host(items, host_id=h, n_hosts=3)) for h in range(3)
    ]
    flat = sorted(x for s in shards for x in s)
    assert flat == items
    assert all(len(s) in (6, 7) for s in shards)


def test_journal_resume(tmp_path):
    path = str(tmp_path / "journal.txt")
    with TargetJournal(path) as j:
        j.mark("t0")
        j.mark("t1")
        j.mark("t0")  # idempotent
    with TargetJournal(path) as j:
        assert "t0" in j and "t1" in j and "t2" not in j
        assert len(j) == 2

        class G:
            def __init__(self, sid):
                self.sid = sid

        fresh = list(j.filter_new([G("t0"), G("t2"), G("t1"), G("t3")]))
        assert [g.sid for g in fresh] == ["t2", "t3"]


def test_bucket_scheduler():
    lins = _lins(range(5), length=60, cov=8)
    sched = BucketScheduler(v_buckets=(256, 512), batch_targets=2)
    flushed = []
    for i, lin in enumerate(lins):
        out = sched.add(i, lin)
        if out:
            flushed.append(out)
    flushed.extend(sched.drain())
    got = sorted(i for _V, batch in flushed for i, _l in batch)
    assert got == [0, 1, 2, 3, 4]
    for V, batch in flushed:
        assert V == -1 or all(l.n <= V for _i, l in batch)


def test_prefetcher_bounded_and_propagates():
    from pbdagcon_tpu.parallel.scheduler import Prefetcher

    got = list(Prefetcher(lambda: iter(range(10)), depth=2))
    assert got == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    import pytest as _pytest

    it = iter(Prefetcher(boom, depth=2))
    assert next(it) == 1
    with _pytest.raises(RuntimeError):
        list(it)


def test_shard_stream_bytes_partition_exact(tmp_path):
    """Byte-range sharding must assign every group to exactly one rank
    (no loss, no duplication) for any N, wherever the byte boundaries
    land — including boundaries exactly at group starts (many tiny
    groups make that likely)."""
    import io as _io

    from pbdagcon_tpu.io import shard_stream_bytes, sid_of_line
    from pbdagcon_tpu.simulate import simulate_targets, to_m5

    lines = []
    for _tid, _bb, alns in simulate_targets(3, 37, 120, 4):
        lines.extend(to_m5(a) for a in alns)
    path = str(tmp_path / "pile.m5")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    full = [l for l in open(path) if l.strip()]
    full_sids = []
    for l in full:
        s = sid_of_line(l, "m5")
        if not full_sids or full_sids[-1] != s:
            full_sids.append(s)
    for n in (1, 2, 3, 5, 8, 13):
        got_lines = []
        per_rank_sids = []
        for i in range(n):
            rl = list(shard_stream_bytes(path, "m5", i, n))
            got_lines.extend(rl)
            sids = []
            for l in rl:
                s = sid_of_line(l, "m5")
                if not sids or sids[-1] != s:
                    sids.append(s)
            per_rank_sids.append(sids)
        assert got_lines == full, f"line partition broken at n={n}"
        merged = [s for sids in per_rank_sids for s in sids]
        assert merged == full_sids, f"group partition broken at n={n}"
        # no group split across ranks
        for i in range(n - 1):
            if per_rank_sids[i] and per_rank_sids[i + 1]:
                assert per_rank_sids[i][-1] != per_rank_sids[i + 1][0]


def test_shard_bytes_cli_merge_matches_single(tmp_path):
    """tpu-dagcon --shard I/N --shard-bytes outputs concatenate to the
    single-process FASTA (group-ordered input)."""
    import subprocess
    import sys as _sys

    from pbdagcon_tpu.simulate import simulate_targets, to_m5

    lines = []
    for _tid, _bb, alns in simulate_targets(8, 9, 200, 8):
        lines.extend(to_m5(a) for a in alns)
    path = str(tmp_path / "pile.m5")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin"}
    import os

    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )

    def run(args):
        r = subprocess.run(
            [_sys.executable, "-m", "pbdagcon_tpu", path, "-c", "3",
             "-m", "50", "--backend", "host"] + args,
            capture_output=True, text=True, env=env,
        )
        assert r.returncode == 0, r.stderr
        return r.stdout

    single = run([])
    merged = "".join(
        run(["--shard", f"{i}/3", "--shard-bytes"]) for i in range(3)
    )
    assert merged == single
