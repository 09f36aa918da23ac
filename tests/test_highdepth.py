"""High-depth stress (BASELINE config #3: 100-500x coverage, gap-heavy
noise): deep merge chains, int16 wire guards, and layout selection must
hold up; all engines stay byte-identical."""

import io as _io
import random

import pytest

from pbdagcon_tpu.config import DagconConfig
from pbdagcon_tpu.io import FastaWriter
from pbdagcon_tpu.pipeline import run_stream
from pbdagcon_tpu.simulate import NoiseProfile, simulate_pileup, to_m5


def _pile_text(seed, L, depth, noise):
    rng = random.Random(seed)
    bb, alns = simulate_pileup(rng, f"deep{seed}", L, depth, noise)
    return "\n".join(to_m5(a) for a in alns) + "\n"


def _run(text, backend, use_native, **kw):
    buf = _io.StringIO()
    stats = run_stream(
        _io.StringIO(text), FastaWriter(buf),
        DagconConfig(backend=backend, use_native=use_native, **kw),
    )
    return buf.getvalue(), stats


@pytest.mark.parametrize("depth", [150, 500])
def test_depth_stress_all_engines_agree(depth):
    noise = NoiseProfile(sub=0.02, ins=0.12, dele=0.08)
    text = _pile_text(1000 + depth, 300, depth, noise)
    host, _ = _run(text, "host", True, min_weight=depth // 8,
                   min_length=50)
    assert host.count(">") >= 1
    pyh, _ = _run(text, "host", False, min_weight=depth // 8,
                  min_length=50)
    assert pyh == host
    xla, st = _run(text, "xla", True, min_weight=depth // 8,
                   min_length=50)
    assert xla == host
    dev, st2 = _run(text, "devbuild", True, min_weight=depth // 8,
                    min_length=50)
    assert dev == host


def test_depth_500_gap_heavy_python_oracle():
    # The old recursive merge overflowed Python's recursion limit on
    # deep shared-insertion chains; the worklist version must not.
    noise = NoiseProfile(sub=0.05, ins=0.25, dele=0.12, max_ins_run=6)
    text = _pile_text(7, 120, 500, noise)
    host, _ = _run(text, "host", True, min_weight=40, min_length=30)
    pyh, _ = _run(text, "host", False, min_weight=40, min_length=30)
    assert pyh == host
