"""DAZZ_DB / .las reader round-trips + dazcon container frontend."""

import io as _io
import random
import subprocess
import sys

import pytest

from pbdagcon_tpu import native
from pbdagcon_tpu.alignment import revcomp
from pbdagcon_tpu.simulate import random_seq

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _mk_db(tmp_path, seqs):
    from pbdagcon_tpu.dazzio import write_dazz_db

    path = str(tmp_path / "fix.db")
    write_dazz_db(path, seqs)
    return path


def test_db_roundtrip(tmp_path):
    from pbdagcon_tpu.dazzio import DazzDb

    rng = random.Random(5)
    seqs = [random_seq(rng, n) for n in (1, 3, 4, 5, 77, 1003)]
    path = _mk_db(tmp_path, seqs)
    with DazzDb(path) as db:
        assert len(db) == len(seqs)
        for i, s in enumerate(seqs):
            assert db.read(i) == s


def test_las_roundtrip(tmp_path):
    from pbdagcon_tpu.dazzio import Overlap, read_las, write_las

    ovls = [
        Overlap(0, 1, False, 10, 90, 0, 82, 7),
        Overlap(0, 2, True, 0, 100, 5, 103, 11),
        Overlap(3, 1, False, 40, 70, 12, 41, 2),
    ]
    path = str(tmp_path / "fix.las")
    write_las(path, ovls)
    assert read_las(path) == ovls


def test_dazcon_container_frontend(tmp_path):
    """tpu-dazcon db.db ovl.las == the FASTA+M4 path on the same data."""
    from pbdagcon_tpu.dazzio import Overlap, write_las
    from pbdagcon_tpu.simulate import NoiseProfile, simulate_pileup

    rng = random.Random(99)
    bb, alns = simulate_pileup(rng, "0", 400, 12, NoiseProfile())
    seqs = [bb]
    ovls = []
    m4_lines = []
    for i, a in enumerate(alns, start=1):
        q = a.qstr.replace("-", "")
        comp = i % 3 == 0
        seqs.append(revcomp(q) if comp else q)
        ovls.append(
            Overlap(0, i, comp, a.start - 1, a.end, 0, len(q), 5)
        )
        m4_lines.append(
            f"{i} 0 5 90.0 {1 if comp else 0} 0 {len(q)} {len(q)} "
            f"0 {a.start - 1} {a.end} {len(bb)}"
        )
    db = _mk_db(tmp_path, seqs)
    las = str(tmp_path / "ovl.las")
    write_las(las, ovls)
    fasta = tmp_path / "reads.fa"
    with open(fasta, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">{i}\n{s}\n")
    m4 = tmp_path / "ovl.m4"
    with open(m4, "w") as f:
        f.write("\n".join(m4_lines) + "\n")

    env = {"PYTHONPATH": "/root/repo", "JAX_PLATFORMS": "cpu",
           "PATH": "/usr/bin:/bin"}
    r1 = subprocess.run(
        [sys.executable, "-m", "pbdagcon_tpu.dazcon", las, db,
         "-c", "2", "-m", "50"],
        capture_output=True, text=True, env=env,
    )
    assert r1.returncode == 0, r1.stderr
    r2 = subprocess.run(
        [sys.executable, "-m", "pbdagcon_tpu.dazcon", str(m4),
         str(fasta), "-c", "2", "-m", "50"],
        capture_output=True, text=True, env=env,
    )
    assert r2.returncode == 0, r2.stderr
    assert r1.stdout == r2.stdout
    assert r1.stdout.startswith(">0\n")
