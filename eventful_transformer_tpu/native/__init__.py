"""Native (C++) host-side runtime components, bound via ctypes.

Build lazily on first use with the system compiler; fall back to pure-numpy
implementations when no compiler is available. Artifacts are cached next to
the sources.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_DIR = Path(__file__).parent


def _build(name):
    src = _DIR / f"{name}.cpp"
    lib = _DIR / f"lib{name}.so"
    if lib.exists() and lib.stat().st_mtime >= src.stat().st_mtime:
        return lib
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", str(lib), str(src)]
    subprocess.run(cmd, check=True, capture_output=True)
    return lib


_cache = {}


def load(name):
    """Load (building if needed) a native library; returns a ctypes CDLL or
    None when the toolchain is unavailable."""
    if name in _cache:
        return _cache[name]
    try:
        lib = ctypes.CDLL(str(_build(name)))
    except Exception:
        lib = None
    _cache[name] = lib
    return lib
