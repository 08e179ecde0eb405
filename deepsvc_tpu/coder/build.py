"""Compile the native rANS coder on demand (cached .so next to the source)."""

from __future__ import annotations

import hashlib
import os
import subprocess
import sysconfig
from pathlib import Path

_CSRC = Path(__file__).parent / "csrc"
_SRC = _CSRC / "rans.cpp"


def _build_dir() -> Path:
    d = Path(__file__).parent / "_build"
    d.mkdir(exist_ok=True)
    return d


def lib_path() -> Path:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    return _build_dir() / f"librans_{tag}.so"


def ensure_built() -> Path:
    out = lib_path()
    if out.exists():
        return out
    cxx = os.environ.get("CXX", "g++")
    cmd = [
        cxx,
        "-O3",
        "-std=c++17",
        "-fPIC",
        "-shared",
        "-fno-exceptions",
        str(_SRC),
        "-o",
        str(out),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out
