"""Hybrid host+device scheduler (backend=hybrid): group-aligned
chunking, byte parity with the host engine, rate-adaptive stealing."""

import io as _io
import random

import pytest

from pbdagcon_tpu import native
from pbdagcon_tpu.config import DagconConfig
from pbdagcon_tpu.hybrid import iter_group_chunks
from pbdagcon_tpu.io import FastaWriter, sid_of_line
from pbdagcon_tpu.pipeline import run_stream
from pbdagcon_tpu.simulate import NoiseProfile, simulate_targets, to_m5


def _workload(n_targets=10, length=240, cov=10, seed=5):
    lines = []
    rng = random.Random(seed)
    for _tid, _bb, alns in simulate_targets(seed, n_targets, length, cov):
        for a in alns:
            lines.append(to_m5(a, flip=rng.random() < 0.3))
    return "\n".join(lines) + "\n"


def test_iter_group_chunks_boundaries_and_reassembly():
    text = _workload(n_targets=9)
    chunks = list(iter_group_chunks(_io.StringIO(text), "m5", 2))
    # Re-assembly reproduces the input exactly (no blank lines here).
    assert b"".join(c for c, _ in chunks).decode() == text
    # Cuts are at group boundaries: last sid of chunk k != first of k+1.
    for (a, _na), (b, _nb) in zip(chunks, chunks[1:]):
        last = a.decode().splitlines()[-1]
        first = b.decode().splitlines()[0]
        assert sid_of_line(last, "m5") != sid_of_line(first, "m5")
    # Group counts sum to the total and respect the minimum.
    assert sum(n for _, n in chunks) == 9
    assert all(n >= 2 for _, n in chunks[:-1])


def test_block_chunker_group_aligned_reassembly():
    from pbdagcon_tpu.hybrid import iter_group_chunks_blocks

    text = _workload(n_targets=9)
    for cb in (1 << 10, 4 << 10, 1 << 20):
        chunks = list(
            iter_group_chunks_blocks(_io.StringIO(text), "m5", cb)
        )
        assert b"".join(chunks).decode() == text
        for a, b in zip(chunks, chunks[1:]):
            last = a.decode().splitlines()[-1]
            first = b.decode().splitlines()[0]
            assert sid_of_line(last, "m5") != sid_of_line(first, "m5")


def test_block_chunker_single_group_and_no_trailing_newline():
    from pbdagcon_tpu.hybrid import iter_group_chunks_blocks

    text = _workload(n_targets=1)
    chunks = list(
        iter_group_chunks_blocks(_io.StringIO(text.rstrip("\n")), "m5", 512)
    )
    assert len(chunks) == 1
    assert chunks[0].decode() == text


def test_iter_group_chunks_drops_blank_lines():
    text = _workload(n_targets=3)
    noisy = text.replace("\n", "\n\n", 4)
    chunks = list(iter_group_chunks(_io.StringIO(noisy), "m5", 1))
    assert b"".join(c for c, _ in chunks).decode() == text


def _run(text: str, backend: str, **kw):
    buf = _io.StringIO()
    cfg = DagconConfig(
        backend=backend, min_weight=3, min_length=50, **kw
    )
    stats = run_stream(_io.StringIO(text), FastaWriter(buf), cfg)
    return buf.getvalue(), stats


@pytest.mark.skipif(not native.ensure_built(), reason="no native engine")
def test_hybrid_matches_host(monkeypatch):
    # Force the device worker to participate (the rate rule would keep
    # a cold device idle on a tiny input), then require byte parity and
    # that BOTH workers actually processed chunks.
    monkeypatch.setenv("DAGCON_HYBRID_FORCE_DEV", "1")
    monkeypatch.setenv("DAGCON_HYBRID_CHUNK_KB", "8")
    text = _workload(n_targets=12, cov=8)
    host, _ = _run(text, "host")
    hyb, stats = _run(text, "hybrid", batch_targets=4)
    assert hyb == host
    assert stats.targets == 12
    assert stats.hybrid_dev_chunks >= 1
    assert stats.hybrid_host_chunks + stats.hybrid_dev_chunks >= 2


@pytest.mark.skipif(not native.ensure_built(), reason="no native engine")
def test_hybrid_unforced_parity(monkeypatch):
    # Without forcing, the rate rule may route everything to the host;
    # output must still be byte-identical and complete.
    monkeypatch.setenv("DAGCON_HYBRID_CHUNK_KB", "8")
    text = _workload(n_targets=8, cov=8, seed=11)
    host, _ = _run(text, "host")
    hyb, stats = _run(text, "hybrid", batch_targets=4)
    assert hyb == host
    assert stats.targets == 8


@pytest.mark.skipif(not native.ensure_built(), reason="no native engine")
def test_hybrid_journal(tmp_path, monkeypatch):
    monkeypatch.setenv("DAGCON_HYBRID_FORCE_DEV", "1")
    monkeypatch.setenv("DAGCON_HYBRID_CHUNK_KB", "8")
    from pbdagcon_tpu.parallel.journal import TargetJournal

    text = _workload(n_targets=6, cov=8, seed=7)
    buf = _io.StringIO()
    cfg = DagconConfig(
        backend="hybrid", min_weight=3, min_length=50, batch_targets=4
    )
    j = TargetJournal(str(tmp_path / "j.log"))
    run_stream(_io.StringIO(text), FastaWriter(buf), cfg, journal=j)
    for line in buf.getvalue().splitlines():
        if line.startswith(">"):
            assert line[1:].rsplit("/", 1)[0] in j


def test_hybrid_degrades_without_native():
    # use_native=False: backend=hybrid must degrade to a working
    # single-worker path, not crash.
    text = _workload(n_targets=4, cov=8, seed=3)
    host, _ = _run(text, "host", use_native=False)
    hyb, _ = _run(text, "hybrid", use_native=False)
    assert hyb == host
