"""Affine scorer (SPEC §1.6): Python/C++ exact agreement, config/CLI
wiring, consensus sensitivity plumbing.

Reference: `src/cpp/SimpleAligner.cpp` wraps blasr_libcpp's guided
affine aligner (SURVEY.md §2 C8; parameters unreadable — mount empty);
this scorer is the framework's affine option and the instrument for
docs/SCORER_SENSITIVITY.md.
"""

import io as _io
import random
import subprocess
import sys

import pytest

from pbdagcon_tpu import native
from pbdagcon_tpu.aligner import align_pair, align_pair_affine
from pbdagcon_tpu.config import DagconConfig
from pbdagcon_tpu.io import FastaWriter
from pbdagcon_tpu.pipeline import run_stream
from pbdagcon_tpu.simulate import NoiseProfile, simulate_targets, to_pre_raw

PARAM_SETS = [(1, -2, -4, -1), (1, -3, -5, -2), (2, -4, -6, -1)]


def _mutate(s: str, rng: random.Random, sub=0.05, ins=0.08, dele=0.06):
    out = []
    for c in s:
        r = rng.random()
        if r < sub:
            out.append(rng.choice("ACGT"))
        elif r < sub + ins:
            out.append(c)
            out.append(rng.choice("ACGT"))
        elif r < sub + ins + dele:
            pass
        else:
            out.append(c)
    return "".join(out)


def test_affine_identical():
    q, t = align_pair_affine("ACGTACGT", "ACGTACGT")
    assert q == t == "ACGTACGT"


def test_affine_empty_sides():
    assert align_pair_affine("", "ACG") == ("---", "ACG")
    assert align_pair_affine("ACG", "") == ("ACG", "---")


def test_affine_prefers_one_long_gap():
    # Two separated single-base deletions vs one 2-gap: with open=-4,
    # extend=-1 a contiguous gap is cheaper (-5) than two opens (-8),
    # so the aligner must keep the deleted region contiguous.
    t = "AAAACCCCGGGGTTTT"
    q = t[:6] + t[8:]  # drop "CC" contiguously
    gq, gt = align_pair_affine(q, t, (1, -2, -4, -1))
    assert gq.replace("-", "") == q and gt.replace("-", "") == t
    # exactly one gap run of length 2 in q
    runs = [r for r in gq.split("-") if r == ""]
    assert gq.count("-") == 2
    assert "--" in gq


def test_affine_degenerates_to_linear_score():
    # With open == extend == -3 the affine scheme is the §1.5 linear
    # scorer; optimal alignment scores must match on random pairs.
    rng = random.Random(11)

    def score_linear(gq, gt):
        s = 0
        for a, b in zip(gq, gt):
            if a == "-" or b == "-":
                s += -3
            elif a == b:
                s += 1
            else:
                s += -2
        return s

    for _ in range(25):
        n = rng.randint(1, 200)
        t = "".join(rng.choice("ACGT") for _ in range(n))
        q = _mutate(t, rng)
        g1 = align_pair(q, t)
        g2 = align_pair_affine(q, t, (1, -2, -3, -3))
        assert score_linear(*g1) == score_linear(*g2)


@pytest.mark.skipif(not native.available(), reason="native not built")
def test_affine_py_vs_native_exact():
    rng = random.Random(42)
    for trial in range(60):
        n = rng.randint(1, 300)
        t = "".join(rng.choice("ACGT") for _ in range(n))
        q = _mutate(t, rng)
        params = PARAM_SETS[trial % len(PARAM_SETS)]
        assert align_pair_affine(q, t, params) == (
            native.align_pair_affine_native(q, t, params)
        ), (trial, params)


def test_config_validation():
    DagconConfig(align_scorer="affine")
    with pytest.raises(ValueError):
        DagconConfig(align_scorer="blasr")
    with pytest.raises(ValueError):  # open must be <= extend
        DagconConfig(align_scorer="affine", affine_params=(1, -2, -1, -4))
    with pytest.raises(ValueError):  # device kernel is simple-only
        DagconConfig(align_scorer="affine", align_backend="device")


def _pileup_text(n_targets=6, length=300, cov=12, seed=5):
    lines = []
    for _t, _bb, alns in simulate_targets(
        seed, n_targets, length, cov, NoiseProfile()
    ):
        lines.extend(to_pre_raw(a) for a in alns)
    return "\n".join(lines) + "\n"


@pytest.mark.skipif(not native.available(), reason="native not built")
def test_affine_consensus_native_vs_python_parity():
    # The -a pipeline under the affine scorer: native engine and pure-
    # Python path must emit identical FASTA (differential exactness,
    # same standard as the simple scorer).
    text = _pileup_text()
    cfg_native = DagconConfig(
        fmt="pre", align=True, align_scorer="affine", min_weight=2,
        min_length=50, backend="host", use_native=True,
    )
    cfg_py = DagconConfig(
        fmt="pre", align=True, align_scorer="affine", min_weight=2,
        min_length=50, backend="host", use_native=False,
    )
    b1, b2 = _io.StringIO(), _io.StringIO()
    run_stream(_io.StringIO(text), FastaWriter(b1), cfg_native)
    run_stream(_io.StringIO(text), FastaWriter(b2), cfg_py)
    assert b1.getvalue() == b2.getvalue()
    assert b1.getvalue().count(">") >= 1


@pytest.mark.skipif(not native.available(), reason="native not built")
def test_cli_align_scorer_flag():
    text = _pileup_text(n_targets=2)
    out = subprocess.run(
        [
            sys.executable, "-m", "pbdagcon_tpu.cli", "-", "--fmt", "pre",
            "-a", "--align-scorer", "affine",
            "--affine-params", "1,-2,-4,-1",
            "-c", "2", "-m", "50", "--backend", "host",
        ],
        input=text.encode(),
        capture_output=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr.decode()[-2000:]
    assert out.stdout.decode().count(">") >= 1
