"""Shared g++ auto-build-and-load for the native host-pipeline stages.

Used by ``data/native.py`` (layout tokenizer) and ``data/native_jpeg.py``
(JPEG decode/resize/jitter). Concurrency-safe: the compile writes to a
process-unique temp file and ``os.rename``s it into place (atomic on POSIX),
so concurrent loader threads/processes never observe a truncated .so; the
load itself is locked and failure-guarded so callers fall back to Python
cleanly instead of crashing on a bad CDLL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

_build_lock = threading.Lock()
# Last failed compile's stderr, keyed by source path — surfaced by callers
# that want to tell the user WHY an opt-in native fast path silently became
# the Python fallback (e.g. --native_decode without libjpeg headers).
_build_errors: dict = {}


def last_build_error(src: str) -> Optional[str]:
    """stderr of the most recent failed compile of ``src`` (None if none)."""
    with _build_lock:
        return _build_errors.get(src)


def build_shared_library(
    src: str, lib: str, *, extra_flags: Optional[List[str]] = None,
    force: bool = False,
) -> Optional[str]:
    """Compile ``src`` → ``lib`` if stale; returns the .so path or None."""
    with _build_lock:
        if not force and os.path.exists(lib) and (
            os.path.getmtime(lib) >= os.path.getmtime(src)
        ):
            return lib
        tmp = f"{lib}.build.{os.getpid()}"
        base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp]
        base += extra_flags or []
        # -march=native measurably helps the pixel loops; retry portable if
        # the toolchain rejects it.
        for flags in (base + ["-march=native"], base):
            try:
                subprocess.run(flags, check=True, capture_output=True, text=True)
                os.replace(tmp, lib)  # atomic publish
                _build_errors.pop(src, None)
                return lib
            except subprocess.CalledProcessError as e:
                _build_errors[src] = e.stderr or str(e)
                continue
            except OSError as e:
                _build_errors[src] = str(e)
                return None
            finally:
                if os.path.exists(tmp):
                    try:
                        os.remove(tmp)
                    except OSError:
                        pass
        return None


def load_shared_library(
    src: str, lib: str, *, extra_flags: Optional[List[str]] = None,
) -> Optional[ctypes.CDLL]:
    """Build if needed and dlopen; returns None on any failure."""
    path = build_shared_library(src, lib, extra_flags=extra_flags)
    if path is None:
        return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None
