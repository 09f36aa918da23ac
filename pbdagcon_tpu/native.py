"""ctypes bindings for the native C++ engine (`native/libdagcon.so`).

The native engine is the production host side: streaming M5/'pre' parse,
gap normalization, graph build + merge, linearization, float32 DP,
backtrack, FASTA emission — multithreaded over targets (the reference is
a pthread pipeline, SURVEY.md §2 C5–C6; ours is a worker pool inside
`dagcon_consensus_text` / `dagcon_linearize_text`). Python falls back to
the pure-Python implementations when the library isn't built.

Build: `make -C native` (plain g++, no external deps). `load_engine()`
returns None if unavailable; `ensure_built()` attempts a build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator

import numpy as np

from pbdagcon_tpu.ops.linearize import LinearGraph

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdagcon.so")

_lib: ctypes.CDLL | None = None
_load_failed = False


def ensure_built(force: bool = False) -> bool:
    """Build libdagcon.so if missing; True if the library exists after."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=300,
        )
    except Exception:
        return False
    return os.path.exists(_LIB_PATH)


def _load() -> ctypes.CDLL | None:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and not ensure_built():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    c_char_pp = ctypes.POINTER(ctypes.c_char_p)
    c_long_p = ctypes.POINTER(ctypes.c_long)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)

    lib.dagcon_engine_new.restype = ctypes.c_void_p
    lib.dagcon_engine_new.argtypes = [ctypes.c_int] * 4
    lib.dagcon_engine_free.argtypes = [ctypes.c_void_p]
    lib.dagcon_consensus_text.restype = ctypes.c_int
    lib.dagcon_consensus_text.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.c_int, c_char_pp, c_long_p,
    ]
    lib.dagcon_free.argtypes = [ctypes.c_char_p]
    lib.dagcon_linearize_text.restype = ctypes.c_int
    lib.dagcon_linearize_text.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.dagcon_target_meta.restype = ctypes.c_int
    lib.dagcon_target_meta.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p, ctypes.c_int,
    ]
    lib.dagcon_target_arrays.restype = ctypes.c_int
    lib.dagcon_target_arrays.argtypes = [
        ctypes.c_void_p, ctypes.c_int, u8p, i32p, i32p, i32p, u8p, i32p,
        i32p, i32p, i32p, i32p, i32p,
    ]
    lib.dagcon_target_consensus.restype = ctypes.c_int
    lib.dagcon_target_consensus.argtypes = [
        ctypes.c_void_p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
        c_char_pp, c_long_p,
    ]
    lib.dagcon_target_scores.restype = ctypes.c_int
    lib.dagcon_target_scores.argtypes = [ctypes.c_void_p, ctypes.c_int, f32p]
    lib.dagcon_engine_targets.restype = ctypes.c_long
    lib.dagcon_engine_targets.argtypes = [ctypes.c_void_p]
    lib.dagcon_long_counts.restype = ctypes.c_int
    lib.dagcon_long_counts.argtypes = [
        ctypes.c_void_p, ctypes.c_int, i32p, ctypes.c_int, i32p,
    ]
    i16p = ctypes.POINTER(ctypes.c_int16)
    lib.dagcon_pack_batch.restype = ctypes.c_int
    lib.dagcon_pack_batch.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, i16p, i16p, i16p, u8p, i32p, i32p, f32p,
    ]
    lib.dagcon_pack_edges.restype = ctypes.c_int
    lib.dagcon_pack_edges.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_long, ctypes.c_long,
        i32p, i16p, u8p, i16p, i32p, i16p, i16p, i16p, u8p,
        i32p, i32p, f32p,
    ]
    lib.dagcon_clear_linears.restype = None
    lib.dagcon_clear_linears.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.dagcon_engine_status.restype = ctypes.c_int
    lib.dagcon_engine_status.argtypes = [ctypes.c_void_p, c_long_p, c_long_p]
    lib.dagcon_encode_text.restype = ctypes.c_int
    lib.dagcon_encode_text.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.dagcon_enc_meta.restype = ctypes.c_int
    lib.dagcon_enc_meta.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p, ctypes.c_int,
    ]
    lib.dagcon_enc_fill.restype = ctypes.c_int
    lib.dagcon_enc_fill.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_long, u8p, i32p, u8p, u8p, i32p,
    ]
    lib.dagcon_enc_fill_packed.restype = ctypes.c_int
    lib.dagcon_enc_fill_packed.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_long, u8p, i32p, u8p, u8p, i32p,
    ]
    lib.dagcon_enc_clear.restype = None
    lib.dagcon_enc_clear.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.dagcon_enc_consensus.restype = ctypes.c_int
    lib.dagcon_enc_consensus.argtypes = [
        ctypes.c_void_p, ctypes.c_int, c_char_pp, c_long_p,
    ]
    lib.dagcon_engine_set_align.restype = None
    lib.dagcon_engine_set_align.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.dagcon_align_pair.restype = ctypes.c_int
    lib.dagcon_align_pair.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
        c_char_pp, c_long_p,
    ]
    lib.dagcon_engine_set_scorer.restype = None
    lib.dagcon_engine_set_scorer.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.dagcon_align_pair_affine.restype = ctypes.c_int
    lib.dagcon_align_pair_affine.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        c_char_pp, c_long_p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def align_pair_native(q: str, t: str) -> tuple[str, str]:
    """Native banded global alignment (SPEC §1.5); exact match with
    `pbdagcon_tpu.aligner.align_pair`."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = ctypes.c_char_p()
    out_len = ctypes.c_long()
    qb, tb = q.encode(), t.encode()
    lib.dagcon_align_pair(
        qb, len(qb), tb, len(tb), ctypes.byref(out), ctypes.byref(out_len)
    )
    try:
        res = ctypes.string_at(out, out_len.value).decode()
    finally:
        lib.dagcon_free(out)
    qs, ts = res.split("\n", 1)
    return qs, ts


def align_pair_affine_native(
    q: str, t: str, params: tuple[int, int, int, int] = (1, -2, -4, -1)
) -> tuple[str, str]:
    """Native affine-gap alignment (SPEC §1.6); exact match with
    `pbdagcon_tpu.aligner.align_pair_affine`."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = ctypes.c_char_p()
    out_len = ctypes.c_long()
    qb, tb = q.encode(), t.encode()
    lib.dagcon_align_pair_affine(
        qb, len(qb), tb, len(tb), *(int(x) for x in params),
        ctypes.byref(out), ctypes.byref(out_len),
    )
    try:
        res = ctypes.string_at(out, out_len.value).decode()
    finally:
        lib.dagcon_free(out)
    qs, ts = res.split("\n", 1)
    return qs, ts


class NativeEngine:
    """One streaming engine instance (wraps `DagconEngine`)."""

    def __init__(
        self,
        min_weight: int = 8,
        min_length: int = 500,
        trim: int = 0,
        threads: int = 4,
        align: bool = False,
        scorer: str = "simple",
        affine_params: tuple[int, int, int, int] = (1, -2, -4, -1),
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable (make -C native)")
        self._lib = lib
        self._h = lib.dagcon_engine_new(min_weight, min_length, trim, threads)
        if align:
            lib.dagcon_engine_set_align(self._h, 1)
        if scorer == "affine":
            lib.dagcon_engine_set_scorer(
                self._h, 1, *(int(x) for x in affine_params)
            )
        self.min_weight = min_weight
        self.min_length = min_length

    def close(self) -> None:
        if self._h:
            self._lib.dagcon_engine_free(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    @property
    def targets_done(self) -> int:
        """Complete target groups consumed so far (host mode)."""
        return int(self._lib.dagcon_engine_targets(self._h))

    def status(self) -> tuple[bool, int, int]:
        """(has_error, dropped_records, dropped_groups) — loud-failure
        accounting so loader-mode callers surface problems the same way
        `consensus_text` does."""
        drec = ctypes.c_long()
        dgrp = ctypes.c_long()
        rc = self._lib.dagcon_engine_status(
            self._h, ctypes.byref(drec), ctypes.byref(dgrp)
        )
        return rc != 0, int(drec.value), int(dgrp.value)

    # -------------------------------------------------------- host mode
    def consensus_text(
        self, text: bytes, fmt: str = "m5", flush: bool = True
    ) -> str:
        """Full native consensus: text chunk in, FASTA out."""
        out = ctypes.c_char_p()
        out_len = ctypes.c_long()
        rc = self._lib.dagcon_consensus_text(
            self._h, text, len(text), 0 if fmt == "m5" else 1,
            1 if flush else 0, ctypes.byref(out), ctypes.byref(out_len),
        )
        try:
            res = ctypes.string_at(out, out_len.value).decode()
        finally:
            self._lib.dagcon_free(out)
        if rc != 0:
            raise ValueError("malformed alignment record in input")
        return res

    # ------------------------------------------------------ loader mode
    def linearize_text(
        self, text: bytes, fmt: str = "m5", flush: bool = True
    ) -> int:
        """Parse + build + merge + linearize complete groups; APPENDS to
        the retained target list and returns the number appended. Use
        `clear_linears(upto)` to release emitted targets from the front
        (later indices shift down by `upto`). Raises ValueError on
        malformed input (same policy as `consensus_text`)."""
        n = self._lib.dagcon_linearize_text(
            self._h, text, len(text), 0 if fmt == "m5" else 1,
            1 if flush else 0,
        )
        err, _, _ = self.status()
        if err:
            raise ValueError("malformed alignment record in input")
        return n

    def clear_linears(self, upto: int) -> None:
        self._lib.dagcon_clear_linears(self._h, upto)

    # ----------------------------------------------- device-build mode
    def encode_text(
        self, text: bytes, fmt: str = "m5", flush: bool = True
    ) -> int:
        """Parse + normalize + encode complete groups for the device
        graph build; appends to the retained encoded list and returns
        the number appended. Raises on malformed input."""
        n = self._lib.dagcon_encode_text(
            self._h, text, len(text), 0 if fmt == "m5" else 1,
            1 if flush else 0,
        )
        if n < 0:
            raise ValueError("malformed alignment record in input")
        return n

    def enc_metas(self, count: int, offset: int = 0) -> np.ndarray:
        """[count, 9] int32: R, max columns, backbone len, #ins bases,
        total columns, max ins-chains/read, max chain length, max
        interior transition span (DQ need), max chain starts per anchor
        (SE need)."""
        out = np.zeros((count, 9), dtype=np.int32)
        meta = (ctypes.c_int * 9)()
        for i in range(count):
            if (
                self._lib.dagcon_enc_meta(
                    self._h, offset + i, meta, None, 0
                )
                < 0
            ):
                raise IndexError(offset + i)
            out[i] = meta[:]
        return out

    def enc_sid(self, idx: int) -> str:
        sid_buf = ctypes.create_string_buffer(4096)
        meta = (ctypes.c_int * 9)()
        if self._lib.dagcon_enc_meta(self._h, idx, meta, sid_buf, 4096) < 0:
            raise IndexError(idx)
        return sid_buf.value.decode()

    def enc_fill(
        self, idxs: list[int], R: int, C: int, L: int, NI: int,
        B: int | None = None,
    ) -> tuple[np.ndarray, ...]:
        """Fill batched device-build inputs for encoded targets `idxs`
        (threaded C++). Returns (ops, starts, bb, ins, Lr)."""
        n = len(idxs)
        Bp = max(B or n, n)
        ops = np.zeros((Bp, R, C), dtype=np.uint8)
        starts = np.zeros((Bp, R), dtype=np.int32)
        bb = np.zeros((Bp, L), dtype=np.uint8)
        ins = np.zeros((Bp, NI), dtype=np.uint8)
        Lr = np.zeros(Bp, dtype=np.int32)
        ia = np.asarray(idxs, dtype=np.int32)

        def p(a, typ):
            return a.ctypes.data_as(ctypes.POINTER(typ))

        rc = self._lib.dagcon_enc_fill(
            self._h, p(ia, ctypes.c_int32), n, R, C, L, NI,
            p(ops, ctypes.c_uint8), p(starts, ctypes.c_int32),
            p(bb, ctypes.c_uint8), p(ins, ctypes.c_uint8),
            p(Lr, ctypes.c_int32),
        )
        if rc != 0:
            raise ValueError(f"encoded target does not fit caps (rc={rc})")
        return ops, starts, bb, ins, Lr

    def enc_fill_packed(
        self, idxs: list[int], R: int, C: int, L: int, NI: int,
        B: int | None = None,
    ) -> tuple[np.ndarray, ...]:
        """Like enc_fill, but the ops stream is 2-bit packed: four
        column ops per byte (col 4k in bits 0-1 of byte k), shape
        [B, R, C//4]. C must be a multiple of 4. Quarters the dominant
        device upload; unpacked inside the jitted build program."""
        if C % 4 != 0:
            raise ValueError(f"C={C} not a multiple of 4")
        n = len(idxs)
        Bp = max(B or n, n)
        ops = np.zeros((Bp, R, C // 4), dtype=np.uint8)
        starts = np.zeros((Bp, R), dtype=np.int32)
        bb = np.zeros((Bp, L), dtype=np.uint8)
        ins = np.zeros((Bp, NI), dtype=np.uint8)
        Lr = np.zeros(Bp, dtype=np.int32)
        ia = np.asarray(idxs, dtype=np.int32)

        def p(a, typ):
            return a.ctypes.data_as(ctypes.POINTER(typ))

        rc = self._lib.dagcon_enc_fill_packed(
            self._h, p(ia, ctypes.c_int32), n, R, C, L, NI,
            p(ops, ctypes.c_uint8), p(starts, ctypes.c_int32),
            p(bb, ctypes.c_uint8), p(ins, ctypes.c_uint8),
            p(Lr, ctypes.c_int32),
        )
        if rc < 0:
            # C-ABI contract violation (e.g. C % 4 != 0), not a caps
            # overflow — distinct message so callers can tell.
            raise ValueError(
                f"enc_fill_packed: invalid arguments (rc={rc}; C must "
                f"be a multiple of 4)"
            )
        if rc != 0:
            raise ValueError(f"encoded target does not fit caps (rc={rc})")
        return ops, starts, bb, ins, Lr

    def enc_clear(self, upto: int) -> None:
        self._lib.dagcon_enc_clear(self._h, upto)

    def enc_consensus(self, idx: int) -> str:
        """Exact host consensus for one encoded target (fallback)."""
        out = ctypes.c_char_p()
        out_len = ctypes.c_long()
        rc = self._lib.dagcon_enc_consensus(
            self._h, idx, ctypes.byref(out), ctypes.byref(out_len)
        )
        if rc != 0:
            raise IndexError(idx)
        try:
            return ctypes.string_at(out, out_len.value).decode()
        finally:
            self._lib.dagcon_free(out)

    def get_linear(self, idx: int) -> LinearGraph:
        """Export target `idx` as a `LinearGraph` (CSR -> lists)."""
        meta = (ctypes.c_int * 5)()
        sid_buf = ctypes.create_string_buffer(4096)
        rc = self._lib.dagcon_target_meta(self._h, idx, meta, sid_buf, 4096)
        if rc < 0:
            raise IndexError(idx)
        n, span, n_edges, n_enter, bb_len = (
            meta[0], meta[1], meta[2], meta[3], meta[4],
        )
        base = np.zeros(max(1, n), dtype=np.uint8)
        weight = np.zeros(max(1, n), dtype=np.int32)
        bb = np.zeros(max(1, n), dtype=np.int32)
        cov = np.zeros(max(1, n), dtype=np.int32)
        unsup8 = np.zeros(max(1, n), dtype=np.uint8)
        exit_count = np.zeros(max(1, n), dtype=np.int32)
        edge_off = np.zeros(n + 1, dtype=np.int32)
        edge_tgt = np.zeros(max(1, n_edges), dtype=np.int32)
        edge_cnt = np.zeros(max(1, n_edges), dtype=np.int32)
        enter_tgt = np.zeros(max(1, n_enter), dtype=np.int32)
        enter_cnt = np.zeros(max(1, n_enter), dtype=np.int32)

        def p(a, typ):
            return a.ctypes.data_as(ctypes.POINTER(typ))

        rc = self._lib.dagcon_target_arrays(
            self._h, idx,
            p(base, ctypes.c_uint8), p(weight, ctypes.c_int32),
            p(bb, ctypes.c_int32), p(cov, ctypes.c_int32),
            p(unsup8, ctypes.c_uint8), p(exit_count, ctypes.c_int32),
            p(edge_off, ctypes.c_int32), p(edge_tgt, ctypes.c_int32),
            p(edge_cnt, ctypes.c_int32), p(enter_tgt, ctypes.c_int32),
            p(enter_cnt, ctypes.c_int32),
        )
        if rc != 0:
            raise RuntimeError("dagcon_target_arrays failed")
        return LinearGraph(
            sid=sid_buf.value.decode(),
            backbone_len=bb_len,
            n=n,
            span=span,
            base=base[:n],
            weight=weight[:n],
            bb=bb[:n],
            cov=cov[:n],
            unsup=unsup8[:n].astype(bool),
            exit_count=exit_count[:n],
            edge_off=edge_off,
            edge_tgt=edge_tgt[:n_edges],
            edge_cnt=edge_cnt[:n_edges],
            enter_tgt=enter_tgt[:n_enter],
            enter_cnt=enter_cnt[:n_enter],
        )

    def target_scores(self, idx: int, n: int) -> np.ndarray:
        """Native float32 DP for target idx; returns scores[n+1]."""
        s = np.zeros(n + 1, dtype=np.float32)
        rc = self._lib.dagcon_target_scores(
            self._h, idx, s.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if rc != 0:
            raise IndexError(idx)
        return s

    def target_consensus(self, idx: int, scores: np.ndarray) -> str:
        """Native backtrack + FASTA emission given scores[n+1]."""
        s = np.ascontiguousarray(scores, dtype=np.float32)
        out = ctypes.c_char_p()
        out_len = ctypes.c_long()
        rc = self._lib.dagcon_target_consensus(
            self._h, idx, s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.min_weight, self.min_length,
            ctypes.byref(out), ctypes.byref(out_len),
        )
        if rc != 0:
            raise IndexError(idx)
        try:
            return ctypes.string_at(out, out_len.value).decode()
        finally:
            self._lib.dagcon_free(out)

    def pack_edges(
        self,
        idxs: list[int],
        V: int,
        W: int,
        K: int,
        b_pad: int,
        e_pad: int,
        x_pad: int,
    ) -> dict:
        """Edge-CSR batch packing into one arena buffer (threaded C++).
        The caller sizes e_pad/x_pad from metas (total edge counts,
        padded to a stable bucket). Raises LongEdgeOverflow when a
        target or the capacity doesn't fit."""
        from pbdagcon_tpu.ops.dp import LongEdgeOverflow, edges_layout

        B = len(idxs)
        Bp = max(b_pad, B)
        off = edges_layout(Bp, V, K, e_pad, x_pad)
        arena = np.zeros(off["_total"], dtype=np.uint8)

        def view(name, dtype, shape):
            a, b = off[name]
            return arena[a:b].view(dtype).reshape(shape)

        eoff = view("eoff", np.int32, (Bp + 1,))
        ue = view("ue", np.int16, (e_pad,))
        de = view("de", np.uint8, (e_pad,))
        ce = view("ce", np.int16, (e_pad,))
        xoff = view("xoff", np.int32, (Bp + 1,))
        xu = view("xu", np.int16, (x_pad,))
        xc = view("xc", np.int16, (x_pad,))
        cov = view("cov", np.int16, (Bp, V))
        unsup = view("unsup", np.uint8, (Bp, V))
        long_u = view("long_u", np.int32, (Bp, K))
        long_u[:] = -1
        long_w = view("long_w", np.int32, (Bp, K))
        long_w[:] = -1
        long_esc = view("long_esc", np.float32, (Bp, K))
        long_esc[:] = -np.inf

        ia = np.asarray(idxs, dtype=np.int32)

        def p(a, typ):
            return a.ctypes.data_as(ctypes.POINTER(typ))

        rc = self._lib.dagcon_pack_edges(
            self._h, p(ia, ctypes.c_int32), B, V, W, K, e_pad, x_pad,
            p(eoff, ctypes.c_int32), p(ue, ctypes.c_int16),
            p(de, ctypes.c_uint8), p(ce, ctypes.c_int16),
            p(xoff, ctypes.c_int32), p(xu, ctypes.c_int16),
            p(xc, ctypes.c_int16), p(cov, ctypes.c_int16),
            p(unsup, ctypes.c_uint8), p(long_u, ctypes.c_int32),
            p(long_w, ctypes.c_int32), p(long_esc, ctypes.c_float),
        )
        if rc != 0:
            raise LongEdgeOverflow(
                f"pack_edges: target/capacity does not fit (rc={rc})"
            )
        # Pad rows B..Bp get empty edge ranges.
        eoff[B + 1 :] = eoff[B]
        xoff[B + 1 :] = xoff[B]
        return {
            "_edges_arena": arena,
            "_dims": (Bp, V, W, K, e_pad, x_pad),
        }

    def iter_linears(self, count: int) -> Iterator[LinearGraph]:
        for i in range(count):
            yield self.get_linear(i)

    def metas(self, count: int, offset: int = 0) -> np.ndarray:
        """[count, 5] int32: n, span, n_edges, n_enter, backbone_len for
        retained targets offset..offset+count-1."""
        out = np.zeros((count, 5), dtype=np.int32)
        meta = (ctypes.c_int * 5)()
        for i in range(count):
            if (
                self._lib.dagcon_target_meta(
                    self._h, offset + i, meta, None, 0
                )
                < 0
            ):
                raise IndexError(offset + i)
            out[i] = meta[:]
        return out

    def target_sid(self, idx: int) -> str:
        sid_buf = ctypes.create_string_buffer(4096)
        meta = (ctypes.c_int * 5)()
        if self._lib.dagcon_target_meta(self._h, idx, meta, sid_buf, 4096) < 0:
            raise IndexError(idx)
        return sid_buf.value.decode()

    def long_counts(self, idx: int, ws: tuple[int, ...]) -> np.ndarray:
        """#interior edges with span > W for each W in `ws`."""
        wa = np.asarray(ws, dtype=np.int32)
        out = np.zeros(len(ws), dtype=np.int32)
        rc = self._lib.dagcon_long_counts(
            self._h, idx,
            wa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ws),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise IndexError(idx)
        return out

    def pack_batch(
        self, idxs: list[int], V: int, W: int, K: int, b_pad: int | None = None
    ) -> dict[str, np.ndarray]:
        """Threaded C++ packing of a bucket batch for the device DP
        (same contract as `ops.dp.pad_batch`). Raises LongEdgeOverflow
        on any target that does not fit. `b_pad` pads the batch dim at
        allocation time (rows beyond len(idxs) stay empty: no edges)."""
        from pbdagcon_tpu.ops.dp import LongEdgeOverflow, arena_layout

        B = len(idxs)
        Bp = max(b_pad or B, B)
        ia = np.asarray(idxs, dtype=np.int32)
        # One contiguous arena: the caller can upload the whole batch in
        # a single transfer (per-transfer fixed costs dominate tunneled
        # links). Each array is a view into it.
        off = arena_layout(Bp, V, W, K)
        arena = np.zeros(off["_total"], dtype=np.uint8)

        def view(name, dtype, shape):
            a, b = off[name]
            return arena[a:b].view(dtype).reshape(shape)

        win = view("win_count", np.int16, (Bp, V, W))
        win[:] = -1
        exit_c = view("exit_count", np.int16, (Bp, V))
        exit_c[:] = -1
        cov = view("cov", np.int16, (Bp, V))
        unsup = view("unsup", np.uint8, (Bp, V))
        long_u = view("long_u", np.int32, (Bp, K))
        long_u[:] = -1
        long_w = view("long_w", np.int32, (Bp, K))
        long_w[:] = -1
        long_esc = view("long_esc", np.float32, (Bp, K))
        long_esc[:] = -np.inf

        def p(a, typ):
            return a.ctypes.data_as(ctypes.POINTER(typ))

        rc = self._lib.dagcon_pack_batch(
            self._h, p(ia, ctypes.c_int32), B, V, W, K,
            p(win, ctypes.c_int16), p(exit_c, ctypes.c_int16),
            p(cov, ctypes.c_int16), p(unsup, ctypes.c_uint8),
            p(long_u, ctypes.c_int32), p(long_w, ctypes.c_int32),
            p(long_esc, ctypes.c_float),
        )
        if rc != 0:
            raise LongEdgeOverflow(
                f"target index {idxs[rc - 1]} does not fit (V={V}, W={W}, "
                f"K={K})"
            )
        return {
            "win_count": win,
            "exit_count": exit_c,
            "cov": cov,
            "unsup": unsup.astype(bool),
            "long_u": long_u,
            "long_w": long_w,
            "long_esc": long_esc,
            "_arena": arena,
            "_dims": (Bp, V, W, K),
        }
