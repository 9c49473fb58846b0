"""Native (C++) components.

``get_ciderd()`` returns the compiled _ciderd extension module, building it
with g++ on first use (CPython C API, no pybind11 — see ciderd.cpp), or
None when no toolchain is available (callers fall back to the pure-python
scorer).
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import subprocess
import sysconfig

_DIR = os.path.dirname(__file__)
_mod = None
_tried = False


def build() -> str:
    """Compile ciderd.cpp -> _ciderd.so next to it; returns the .so path."""
    src = os.path.join(_DIR, "ciderd.cpp")
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_DIR, "_ciderd" + ext)
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    include = sysconfig.get_paths()["include"]
    # compile to a per-pid temp and os.replace (atomic): multihost training
    # spawns N processes that all reach here concurrently on a fresh clone,
    # and a reader must never import a half-written .so
    tmp = f"{out}.tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           f"-I{include}", src, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, out)
    except subprocess.CalledProcessError as e:
        raise RuntimeError(f"g++ failed: {(e.stderr or '').strip()[-500:]}") \
            from e
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return out


def get_ciderd():
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    try:
        so = build()
        spec = importlib.util.spec_from_file_location("_ciderd", so)
        _mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(_mod)
    except Exception as e:  # no toolchain / build failure -> python fallback
        print(f"native ciderd unavailable ({e}); using the python scorer")
        _mod = None
    return _mod
