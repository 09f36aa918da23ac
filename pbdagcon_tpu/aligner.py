"""Pairwise re-aligner: banded global DP (SimpleAligner equivalent).

Python spec implementation of SPEC.md §1.5 — the reference's
`SimpleAligner::align` wraps blasr_libcpp's guided aligner
(`src/cpp/SimpleAligner.cpp`, SURVEY.md §2 C8; reconstructed, mount
empty). Used by the `-a` path (unaligned 'pre' pairs) and the
dazcon-equivalent frontend. The C++ engine implements the identical
integer DP; `ops/align_tpu.py` is the batched device version.
"""

from __future__ import annotations

import numpy as np

from pbdagcon_tpu.alignment import Alignment

MATCH = 1
MISMATCH = -2
GAP = -3
NEG = -(1 << 30)


def band_halfwidth(m: int, n: int) -> int:
    return max(64, abs(m - n) + 32)


def align_pair(q: str, t: str) -> tuple[str, str]:
    """Banded global alignment of query `q` vs target `t` (SPEC §1.5).

    Returns gapped (qstr, tstr). Deterministic tie-break:
    diagonal > up (gap in t) > left (gap in q), chosen at traceback.
    """
    m, n = len(q), len(t)
    if m == 0:
        return "-" * n, t
    if n == 0:
        return q, "-" * m
    qb = np.frombuffer(q.encode(), dtype=np.uint8)
    tb = np.frombuffer(t.encode(), dtype=np.uint8)
    bw = band_halfwidth(m, n)

    H = np.full((m + 1, n + 1), NEG, dtype=np.int32)
    H[0, : n + 1] = np.arange(n + 1, dtype=np.int32) * GAP
    H[: m + 1, 0] = np.arange(m + 1, dtype=np.int32) * GAP
    # Row-vectorized banded fill.
    for i in range(1, m + 1):
        center = i * n // m
        lo = max(1, center - bw)
        hi = min(n, center + bw)
        if lo > hi:
            continue
        sub = np.where(qb[i - 1] == tb[lo - 1 : hi], MATCH, MISMATCH)
        diag = H[i - 1, lo - 1 : hi] + sub
        up = H[i - 1, lo : hi + 1] + GAP
        best = np.maximum(diag, up)
        # Left dependency is sequential within the row.
        row = H[i]
        prev = row[lo - 1]
        out = np.empty(hi - lo + 1, dtype=np.int32)
        for j in range(hi - lo + 1):
            v = best[j]
            left = prev + GAP
            if left > v:
                v = left
            out[j] = v
            prev = v
        row[lo : hi + 1] = out

    # Traceback with the normative tie-break.
    qs = bytearray()
    ts = bytearray()
    i, j = m, n
    while i > 0 or j > 0:
        h = H[i, j]
        if i > 0 and j > 0 and h == H[i - 1, j - 1] + (
            MATCH if qb[i - 1] == tb[j - 1] else MISMATCH
        ):
            qs.append(qb[i - 1])
            ts.append(tb[j - 1])
            i -= 1
            j -= 1
        elif i > 0 and h == H[i - 1, j] + GAP:
            qs.append(qb[i - 1])
            ts.append(ord("-"))
            i -= 1
        else:
            qs.append(ord("-"))
            ts.append(tb[j - 1])
            j -= 1
    return qs[::-1].decode(), ts[::-1].decode()


def align_record(aln: Alignment) -> Alignment:
    """Fill gapped strings for a record carrying raw (ungapped) q/t
    sequences — the reference's `dagcon -a` semantics on 'pre' input."""
    qstr, tstr = align_pair(aln.qstr, aln.tstr)
    out = Alignment(
        id=aln.id, sid=aln.sid, tlen=aln.tlen, start=aln.start,
        qstr=qstr, tstr=tstr,
    )
    return out.recompute_end()
