"""End-to-end tests for the all-on-device pipeline (backend=devbuild):
byte parity with the host path over the CLI surface."""

import io as _io
import random

from pbdagcon_tpu.config import DagconConfig
from pbdagcon_tpu.io import FastaWriter
from pbdagcon_tpu.pipeline import run_stream
from pbdagcon_tpu.simulate import (
    NoiseProfile,
    simulate_targets,
    to_m5,
    to_pre,
)


def _run(text: str, backend: str, **kw) -> tuple[str, object]:
    buf = _io.StringIO()
    cfg = DagconConfig(backend=backend, use_native=False, **kw)
    stats = run_stream(_io.StringIO(text), FastaWriter(buf), cfg)
    return buf.getvalue(), stats


def test_devbuild_matches_host_m5():
    lines = []
    rng = random.Random(31337)
    for tid, _bb, alns in simulate_targets(77, 6, 300, 12):
        for a in alns:
            lines.append(to_m5(a, flip=rng.random() < 0.3))
    text = "\n".join(lines) + "\n"
    host, _ = _run(text, "host", min_weight=3, min_length=50)
    dev, stats = _run(text, "devbuild", min_weight=3, min_length=50)
    assert dev == host
    assert stats.targets == 6
    assert stats.batches >= 1


def test_devbuild_matches_host_pre_gappy():
    lines = []
    for tid, _bb, alns in simulate_targets(
        55, 4, 150, 8, NoiseProfile(sub=0.05, ins=0.2, dele=0.1)
    ):
        for a in alns:
            lines.append(to_pre(a))
    text = "\n".join(lines) + "\n"
    host, _ = _run(text, "host", fmt="pre", min_weight=2, min_length=20)
    dev, stats = _run(
        text, "devbuild", fmt="pre", min_weight=2, min_length=20
    )
    assert dev == host


def test_devbuild_with_trim_and_fallbacks():
    lines = []
    for tid, _bb, alns in simulate_targets(91, 3, 500, 25):
        for a in alns:
            lines.append(to_m5(a))
    text = "\n".join(lines) + "\n"
    host, _ = _run(text, "host", min_weight=4, min_length=100, trim=2)
    dev, stats = _run(
        text, "devbuild", min_weight=4, min_length=100, trim=2
    )
    assert dev == host


def test_devbuild_native_streaming_matches_host():
    """Native encoder + device build + device backtrack == native host
    engine, over the streaming entry (m5 + align-mode pre)."""
    import pytest

    from pbdagcon_tpu import native

    if not native.available():
        pytest.skip("native library not built")
    lines = []
    rng = random.Random(11)
    for tid, _bb, alns in simulate_targets(42, 5, 400, 18):
        for a in alns:
            lines.append(to_m5(a, flip=rng.random() < 0.25))
    text = "\n".join(lines) + "\n"
    buf_h = _io.StringIO()
    run_stream(
        _io.StringIO(text), FastaWriter(buf_h),
        DagconConfig(backend="host", use_native=True, min_weight=3,
                     min_length=60),
    )
    buf_d = _io.StringIO()
    stats = run_stream(
        _io.StringIO(text), FastaWriter(buf_d),
        DagconConfig(backend="devbuild", use_native=True, min_weight=3,
                     min_length=60),
    )
    assert buf_d.getvalue() == buf_h.getvalue()
    assert stats.targets == 5


def test_devbuild_native_align_mode():
    import pytest

    from pbdagcon_tpu import native
    from pbdagcon_tpu.simulate import to_pre_raw

    if not native.available():
        pytest.skip("native library not built")
    lines = []
    for tid, _bb, alns in simulate_targets(17, 3, 250, 10):
        for a in alns:
            lines.append(to_pre_raw(a))
    text = "\n".join(lines) + "\n"
    buf_h = _io.StringIO()
    run_stream(
        _io.StringIO(text), FastaWriter(buf_h),
        DagconConfig(backend="host", use_native=True, fmt="pre",
                     align=True, min_weight=2, min_length=50),
    )
    buf_d = _io.StringIO()
    run_stream(
        _io.StringIO(text), FastaWriter(buf_d),
        DagconConfig(backend="devbuild", use_native=True, fmt="pre",
                     align=True, min_weight=2, min_length=50),
    )
    assert buf_d.getvalue() == buf_h.getvalue()
