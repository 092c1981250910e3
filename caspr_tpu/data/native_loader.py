"""ctypes bindings for the native C++ sequence loader (native/npz_loader.cpp).

Drop-in replacement for dataset.load_seq_path with identical output; the
host has a single CPU core, so zip/npy parsing and sequence assembly in
C++ (with internal threading) keeps data loading off the training loop's
critical path.  Falls back to the numpy path when the toolchain is
unavailable (see dataset.load_seq_path)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "npz_loader.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "build", "libcaspr_npz.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load_native():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
                _SRC
            ):
                os.makedirs(os.path.dirname(_LIB), exist_ok=True)
                subprocess.run(
                    [
                        "g++",
                        "-O3",
                        "-march=native",
                        "-shared",
                        "-fPIC",
                        "-std=c++17",
                        _SRC,
                        "-o",
                        _LIB,
                        "-lz",
                        "-lpthread",
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.caspr_load_sequence.restype = ctypes.c_int
            lib.caspr_load_sequence.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_int64,
                ctypes.c_double,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
            ]
            _lib = lib
        except Exception as exc:
            print(f"WARNING: native npz loader unavailable ({exc}); using numpy")
            _lib_failed = True
        return _lib


def native_available() -> bool:
    return _load_native() is not None


def load_seq_path_native(
    seq_path_list: Sequence[str],
    max_timestamp: float = 5.0,
    expected_num_pts: int = 4096,
    num_threads: int = 2,
):
    """Native twin of dataset.load_seq_path; returns
    (nocs (T,N,4), depth (T,N,4), pose (T,4,4)) float64."""
    lib = _load_native()
    if lib is None:
        from .dataset import load_seq_path

        return load_seq_path(seq_path_list, max_timestamp, expected_num_pts)

    t = len(seq_path_list)
    nocs = np.zeros((t, expected_num_pts, 4), np.float64)
    depth = np.zeros((t, expected_num_pts, 4), np.float64)
    pose = np.zeros((t, 4, 4), np.float64)
    paths_blob = b"".join(p.encode() + b"\x00" for p in seq_path_list)
    rc = lib.caspr_load_sequence(
        paths_blob,
        t,
        expected_num_pts,
        max_timestamp,
        num_threads,
        nocs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        pose.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc < 0:
        raise IOError(f"native loader failed on frame {-rc - 1} of sequence")
    return nocs, depth, pose
