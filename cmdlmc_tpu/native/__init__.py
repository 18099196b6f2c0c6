"""Native (C++) host-side components, bound via ctypes.

Compiled lazily with g++ on first use and cached next to the sources; every
caller must tolerate absence (pure-numpy fallbacks exist for all native
paths)."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "_native.so")
_SOURCES = [os.path.join(_HERE, "xyz_parser.cpp")]

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _SO_PATH, *_SOURCES,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as exc:
        logger.warning("Native build failed (%s); using numpy fallbacks", exc)
        return False


def _stale() -> bool:
    if not os.path.exists(_SO_PATH):
        return True
    so_mtime = os.path.getmtime(_SO_PATH)
    return any(os.path.getmtime(src) > so_mtime for src in _SOURCES)


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("CMDLMC_NO_NATIVE"):
            return None
        if _stale() and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError as exc:
            logger.warning("Could not load %s: %s", _SO_PATH, exc)
            return None
        lib.parse_atom_lines.restype = ctypes.c_int64
        lib.parse_atom_lines.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_int64,
        ]
        _lib = lib
        return _lib


NAME_WIDTH = 4


def parse_atom_lines(text: bytes, max_atoms: int, first_names: int):
    """Native tokenizer: atom lines -> (names [first_names], positions
    [n, 3] float32). Returns None if the native library is unavailable or the
    input is malformed (caller falls back to numpy)."""
    lib = get_lib()
    if lib is None:
        return None
    pos = np.empty((max_atoms, 3), dtype=np.float32)
    names_buf = ctypes.create_string_buffer(first_names * NAME_WIDTH)
    n = lib.parse_atom_lines(
        text, len(text), max_atoms,
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        names_buf, first_names, NAME_WIDTH,
    )
    if n < 0:
        return None
    names = np.frombuffer(names_buf.raw, dtype=f"S{NAME_WIDTH}").astype("U4")
    names = np.char.strip(names)
    return names, pos[:n]
