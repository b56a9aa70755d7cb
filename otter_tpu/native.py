"""ctypes binding to the native runtime library (native/otter_native.cpp).

Builds the shared library on demand with g++ (no external deps). Provides
the CPU banded edit-distance batch used as the bench baseline and as a host
fast path when no accelerator is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "otter_native.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libotter_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def build_native(force: bool = False) -> str:
    if not force and os.path.exists(_LIB) and \
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            path = build_native()
            lib = ctypes.CDLL(path)
            lib.otter_edit_distance.restype = ctypes.c_int32
            lib.otter_edit_distance.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.otter_edit_distance_batch.restype = None
            lib.otter_edit_distance_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.otter_bam_parse.restype = ctypes.c_void_p
            lib.otter_bam_parse.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
            lib.otter_bam_count.restype = ctypes.c_int64
            lib.otter_bam_count.argtypes = [ctypes.c_void_p]
            lib.otter_bam_columns.restype = None
            lib.otter_bam_columns.argtypes = [ctypes.c_void_p] + \
                [ctypes.POINTER(ctypes.c_int32)] * 5 + \
                [ctypes.POINTER(ctypes.c_int64)] * 4
            lib.otter_bam_blob_sizes.restype = ctypes.c_int64
            lib.otter_bam_blob_sizes.argtypes = [ctypes.c_void_p] + \
                [ctypes.POINTER(ctypes.c_int64)] * 4
            lib.otter_bam_blobs.restype = None
            lib.otter_bam_blobs.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8)]
            lib.otter_bam_free.restype = None
            lib.otter_bam_free.argtypes = [ctypes.c_void_p]
            _lib = lib
        return _lib


def parse_bam_records(raw: bytes):
    """Decode a raw concatenated BAM record stream with the C++ feeder.

    Returns a dict of numpy columns + blob arrays (see otter_native.cpp).
    """
    lib = get_lib()
    buf = np.frombuffer(raw, dtype=np.uint8)
    h = lib.otter_bam_parse(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(raw))
    try:
        n = lib.otter_bam_count(h)
        cols = {k: np.zeros(n, dtype=np.int32)
                for k in ("ref_id", "pos", "flag", "mapq", "l_qseq")}
        offs = {k: np.zeros(n + 1, dtype=np.int64)
                for k in ("name_off", "cigar_off", "seq_off", "aux_off")}
        lib.otter_bam_columns(
            h, *[cols[k].ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
                 for k in ("ref_id", "pos", "flag", "mapq", "l_qseq")],
            *[offs[k].ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
              for k in ("name_off", "cigar_off", "seq_off", "aux_off")])
        sz = [ctypes.c_int64(0) for _ in range(4)]
        lib.otter_bam_blob_sizes(h, *[ctypes.byref(s) for s in sz])
        names = ctypes.create_string_buffer(max(1, sz[0].value))
        cigars = np.zeros(max(1, sz[1].value), dtype=np.uint32)
        seqs = ctypes.create_string_buffer(max(1, sz[2].value))
        auxs = np.zeros(max(1, sz[3].value), dtype=np.uint8)
        lib.otter_bam_blobs(
            h, names, cigars.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            seqs, auxs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return {
            **cols, **offs,
            "names": names.raw[: sz[0].value],
            "cigars": cigars[: sz[1].value],
            "seqs": seqs.raw[: sz[2].value],
            "auxs": auxs[: sz[3].value],
        }
    finally:
        lib.otter_bam_free(h)


def edit_distance_batch(pairs: List[Tuple[str, str]],
                        n_threads: int = 1) -> Tuple[np.ndarray, int]:
    """Exact edit distances via the native library; returns (dists, cells)."""
    lib = get_lib()
    blobs = []
    offsets = np.zeros(2 * len(pairs) + 1, dtype=np.int64)
    pos = 0
    for i, (a, b) in enumerate(pairs):
        ab = a.encode("latin-1")
        bb = b.encode("latin-1")
        blobs.append(ab)
        blobs.append(bb)
        offsets[2 * i + 1] = pos + len(ab)
        offsets[2 * i + 2] = pos + len(ab) + len(bb)
        pos += len(ab) + len(bb)
    seqs = np.frombuffer(b"".join(blobs) + b"\x00", dtype=np.uint8).copy()
    out = np.zeros(len(pairs), dtype=np.int32)
    cells = ctypes.c_int64(0)
    lib.otter_edit_distance_batch(
        seqs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(pairs), n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(cells))
    return out.astype(np.int64), int(cells.value)
