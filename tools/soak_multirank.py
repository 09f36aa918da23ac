"""Genome-scale MULTI-RANK streaming soak (VERDICT r3 #5 / Missing #5):
composes streaming + journal + manifest sharding + kill/resume across
2-4 ranks simultaneously — the composition where distributed state bugs
live.

Protocol:
  1. Generate an N-target multi-class m5 file (templated, fast).
  2. Launch R ranks of the CLI on the SAME file:
     `--distributed --shard-bytes --journal j{r}.log` (CPU ranks,
     jax.distributed coordinator on localhost). Each rank parses only
     its byte range and journals its own targets.
  3. SIGKILL rank 1 when its journal passes --kill-at of its share.
  4. Let the surviving ranks finish (the host path has no inter-rank
     collectives; a dead peer must not wedge the others).
  5. Resume the killed rank with explicit `--shard 1/R` (no
     coordinator needed for a solo resume) on the SAME journal.
  6. Validate: every target exactly once across the merged outputs
     (duplicates only from the unjournaled in-flight window, and the
     resume copy byte-identical); with --verify-full, the merged
     output matches an uninterrupted single-process run byte-for-byte
     per target. Reports per-rank wall/cpu, RSS bound, and scaling
     efficiency vs the single-process run.

    python tools/soak_multirank.py [n_targets] [--ranks R]
        [--kill-at F] [--verify-full] [--threads T]
"""
import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

# small/mid classes keep 1M-target inputs ~20 GB
CLASSES = [(300, 8), (700, 14), (1200, 25), (2000, 16), (900, 40)]
SEED = 9242


def _templates():
    import random

    from pbdagcon_tpu.simulate import NoiseProfile, simulate_pileup, to_m5

    blocks = []
    for ci, (length, cov) in enumerate(CLASSES):
        rng = random.Random(SEED + ci)
        _bb, alns = simulate_pileup(rng, "@SID@", length, cov, NoiseProfile())
        blocks.append("\n".join(to_m5(a) for a in alns) + "\n")
    return blocks


def generate_file(path: str, n: int) -> None:
    blocks = _templates()
    t0 = time.time()
    with open(path, "w") as f:
        for i in range(n):
            f.write(blocks[i % len(blocks)].replace("@SID@", f"s{i:07d}"))
    sz = os.path.getsize(path)
    print(
        f"soak: generated {n} targets, {sz/1e9:.1f} GB in "
        f"{time.time()-t0:.0f}s", file=sys.stderr, flush=True,
    )


def _rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for ln in f:
                if ln.startswith("VmRSS"):
                    return int(ln.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def _rank_cmd(inp, rank, ranks, journal, threads, distributed):
    cmd = [
        sys.executable, "-m", "pbdagcon_tpu", inp,
        "-c", "3", "-m", "100", "--backend", "host",
        "-j", str(threads), "--shard-bytes",
        "--journal", journal,
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo")
    if distributed:
        cmd.append("--distributed")
        env.update(
            JAX_COORDINATOR_ADDRESS="127.0.0.1:57431",
            JAX_NUM_PROCESSES=str(ranks),
            JAX_PROCESS_ID=str(rank),
        )
    else:
        cmd += ["--shard", f"{rank}/{ranks}"]
    return cmd, env


def _journal_count(path):
    try:
        with open(path) as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


def _targets_of(path):
    out = {}
    cur = None
    try:
        with open(path) as f:
            for ln in f:
                if ln.startswith(">"):
                    cur = ln[1:].split("/")[0].strip()
                    out.setdefault(cur, []).append(ln)
                elif cur:
                    out[cur].append(ln)
    except OSError:
        pass
    return {k: "".join(v) for k, v in out.items()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, nargs="?", default=1_000_000)
    ap.add_argument("--ranks", type=int, default=2)
    ap.add_argument("--kill-at", type=float, default=0.4)
    ap.add_argument("--threads", type=int, default=2)
    ap.add_argument("--verify-full", action="store_true")
    ap.add_argument("--input", default=None,
                    help="reuse an existing generated pile.m5")
    args = ap.parse_args()

    workdir = tempfile.mkdtemp(prefix="soak_mr_")
    if args.input:
        inp = args.input
    else:
        inp = os.path.join(workdir, "pile.m5")
        generate_file(inp, args.n)
    report = {"n": args.n, "ranks": args.ranks, "workdir": workdir}

    # ---- phase A: all ranks, kill rank 1 mid-run ---------------------
    procs = []
    outs = []
    for r in range(args.ranks):
        j = os.path.join(workdir, f"j{r}.log")
        o = os.path.join(workdir, f"out{r}.fa")
        outs.append(o)
        cmd, env = _rank_cmd(
            inp, r, args.ranks, j, args.threads, distributed=True
        )
        procs.append(subprocess.Popen(
            cmd, stdout=open(o, "w"), stderr=open(
                os.path.join(workdir, f"err{r}A.log"), "w"), env=env,
        ))
    victim = 1 if args.ranks > 1 else 0
    expect_share = args.n // args.ranks
    kill_n = int(expect_share * args.kill_at)
    print(f"soak: phase A running; will SIGKILL rank {victim} at "
          f"~{kill_n} journaled targets", file=sys.stderr, flush=True)
    max_rss = 0.0
    t0 = time.time()
    killed_at = None
    while True:
        time.sleep(1.0)
        for p in procs:
            max_rss = max(max_rss, _rss_mb(p.pid))
        jc = _journal_count(os.path.join(workdir, f"j{victim}.log"))
        if killed_at is None and jc >= kill_n:
            procs[victim].send_signal(signal.SIGKILL)
            killed_at = jc
            print(f"soak: SIGKILLed rank {victim} at {jc} targets "
                  f"({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)
        if all(p.poll() is not None for p in procs):
            break
        if time.time() - t0 > 7200:
            for p in procs:
                p.kill()
            print("soak: TIMEOUT in phase A", file=sys.stderr)
            return 1
    survivors_rc = [p.returncode for i, p in enumerate(procs)
                    if i != victim]
    print(f"soak: phase A done in {time.time()-t0:.0f}s; survivor "
          f"rcs={survivors_rc} killed_at={killed_at}",
          file=sys.stderr, flush=True)
    report["phaseA_s"] = round(time.time() - t0, 1)
    report["survivor_rcs"] = survivors_rc
    assert all(rc == 0 for rc in survivors_rc), (
        "a SURVIVING rank failed — dead-peer handling broken"
    )

    # ---- phase B: resume the victim (solo, explicit shard) -----------
    t1 = time.time()
    jv = os.path.join(workdir, f"j{victim}.log")
    ov = os.path.join(workdir, f"out{victim}_resume.fa")
    cmd, env = _rank_cmd(
        inp, victim, args.ranks, jv, args.threads, distributed=False
    )
    rp = subprocess.Popen(
        cmd, stdout=open(ov, "w"), stderr=open(
            os.path.join(workdir, f"err{victim}B.log"), "w"), env=env,
    )
    while rp.poll() is None:
        time.sleep(1.0)
        max_rss = max(max_rss, _rss_mb(rp.pid))
    assert rp.returncode == 0, "resume rank failed"
    report["resume_s"] = round(time.time() - t1, 1)
    report["max_rss_mb"] = round(max_rss, 1)
    print(f"soak: resume done in {report['resume_s']}s "
          f"max_rss={max_rss:.0f}MB", file=sys.stderr, flush=True)

    # ---- validation ---------------------------------------------------
    per_rank = [_targets_of(o) for o in outs]
    resume_t = _targets_of(ov)
    victim_t = per_rank[victim]
    # duplicates between the victim's killed run and its resume must be
    # byte-identical (in-flight window re-emission).
    dups = set(victim_t) & set(resume_t)
    for sid in dups:
        assert victim_t[sid] == resume_t[sid], f"dup {sid} differs"
    report["resume_dups"] = len(dups)
    merged: dict = {}
    for d in per_rank + [resume_t]:
        merged.update(d)
    # completeness: the emitted-target set must match a reference run.
    expected_ids = {f"s{i:07d}" for i in range(args.n)}
    missing = expected_ids - set(merged)
    # targets can be legitimately dropped by min-length; compare against
    # the reference run when asked, else just report the count.
    report["emitted"] = len(merged)
    report["missing_vs_all"] = len(missing)
    # cross-rank duplicate check: shards must be disjoint.
    seen: dict = {}
    cross_dups = 0
    for ri, d in enumerate(per_rank):
        for sid in d:
            if sid in seen and seen[sid] != ri:
                cross_dups += 1
            seen.setdefault(sid, ri)
    assert cross_dups == 0, f"{cross_dups} targets emitted by 2 ranks"

    if args.verify_full:
        t2 = time.time()
        jf = os.path.join(workdir, "jfull.log")
        of = os.path.join(workdir, "outfull.fa")
        cmd = [
            sys.executable, "-m", "pbdagcon_tpu", inp,
            "-c", "3", "-m", "100", "--backend", "host",
            "-j", str(args.ranks * args.threads), "--journal", jf,
        ]
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH="/root/repo")
        fp = subprocess.run(
            cmd, stdout=open(of, "w"),
            stderr=open(os.path.join(workdir, "errfull.log"), "w"),
            env=env,
        )
        assert fp.returncode == 0
        full_wall = time.time() - t2
        report["single_proc_s"] = round(full_wall, 1)
        full_t = _targets_of(of)
        assert set(full_t) == set(merged), (
            f"target set differs: only-merged="
            f"{list(set(merged)-set(full_t))[:3]} only-full="
            f"{list(set(full_t)-set(merged))[:3]}"
        )
        bad = [s for s in full_t if full_t[s] != merged[s]]
        assert not bad, f"{len(bad)} targets differ vs single-proc"
        report["verify_full"] = True
        # scaling efficiency: uninterrupted multi-rank work time is not
        # directly observable here (we killed a rank); approximate with
        # phase A+B total vs single-proc.
        report["eff_vs_single_pct"] = round(
            100.0 * full_wall
            / (args.ranks * (report["phaseA_s"] + report["resume_s"])), 1
        )
    print("SOAK-MULTIRANK " + json.dumps(report), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
