"""Streaming alignment IO: target-grouped reader and FASTA writer.

TPU-native replacement for the reference's reader/writer threads
(`src/cpp/main.cpp` Reader/Writer functors + `BoundedBuffer.hpp`,
SURVEY.md §2 C5–C6, §3.1 — reconstructed; mount empty). Instead of a
pthread pipeline, the reader is a generator that yields per-target groups
from a target-sorted stream (the reference's semantics: consecutive
records sharing `sid` form one group) and the writer emits the
reference's FASTA format: header `>{sid}/{start}_{end}` per consensus
fragment (SPEC.md §2.7).
"""

from __future__ import annotations

import sys
from typing import IO, Iterable, Iterator, TextIO

from pbdagcon_tpu.alignment import (
    Alignment,
    backbone_from_group,
    group_by_target,
    parse_records,
)
from pbdagcon_tpu.oracle.graph import CnsResult


class TargetGroup:
    """One target's pileup: id, recovered backbone, raw alignments."""

    __slots__ = ("sid", "backbone", "alns")

    def __init__(self, sid: str, backbone: str, alns: list[Alignment]):
        self.sid = sid
        self.backbone = backbone
        self.alns = alns

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"TargetGroup({self.sid!r}, L={len(self.backbone)}, "
            f"n={len(self.alns)})"
        )


def read_groups(
    stream: TextIO | Iterable[str], fmt: str = "m5"
) -> Iterator[TargetGroup]:
    """Stream per-target groups from a target-sorted M5/'pre' stream."""
    for sid, group in group_by_target(parse_records(stream, fmt)):
        yield TargetGroup(sid, backbone_from_group(group), group)


def open_input(path: str) -> IO[str]:
    """Open an input path; '-' means stdin (reference stdin-pipe mode)."""
    if path == "-":
        return sys.stdin
    return open(path)


def format_fasta(
    sid: str, results: Iterable[CnsResult], width: int = 0
) -> str:
    """Render consensus fragments as FASTA text.

    Header `>{sid}/{start}_{end}` with the fragment's half-open backbone
    range (SPEC.md §2.7); unwrapped sequence lines by default, matching
    the reference writer.
    """
    out: list[str] = []
    for r in results:
        out.append(f">{sid}/{r.range[0]}_{r.range[1]}\n")
        seq = r.seq
        if width > 0:
            for i in range(0, len(seq), width):
                out.append(seq[i : i + width] + "\n")
        else:
            out.append(seq + "\n")
    return "".join(out)


def sid_of_line(line: str, fmt: str = "m5") -> str:
    """Target id of one record line without full parsing (field 6 for
    M5, field 2 for 'pre')."""
    idx = 5 if fmt == "m5" else 1
    return line.split(None, idx + 1)[idx]


def filter_groups_text(
    stream: TextIO | Iterable[str],
    fmt: str,
    keep,  # callable (sid, group_index) -> bool
) -> Iterator[str]:
    """Pass through only the target-groups `keep` accepts (text level:
    no record parsing) — manifest sharding and journal-resume filtering
    for the streaming pipeline (SURVEY.md §5)."""
    current: str | None = None
    gidx = -1
    keeping = False
    for line in stream:
        if not line.strip():
            continue
        sid = sid_of_line(line, fmt)
        if sid != current:
            current = sid
            gidx += 1
            keeping = bool(keep(sid, gidx))
        if keeping:
            yield line


class FastaWriter:
    """Ordered FASTA emission (the reference writer preserves input
    target order even with `-j` workers; callers hand results back in
    submission order)."""

    def __init__(self, stream: TextIO | None = None, width: int = 0):
        self.stream = stream if stream is not None else sys.stdout
        self.width = width
        self.n_fragments = 0
        self.n_bases = 0

    def write_target(self, sid: str, results: list[CnsResult]) -> None:
        text = format_fasta(sid, results, self.width)
        if text:
            self.stream.write(text)
        self.n_fragments += len(results)
        self.n_bases += sum(len(r.seq) for r in results)
