"""Shared native build helper (data/_native_build.py).

The auto-build must be safe under concurrent first use (loader threads, or
pytest + a training process hitting the same .so path): compiles publish via
an atomic temp-file rename, and load failures degrade to None (callers fall
back to Python/PIL) instead of crashing.
"""

import concurrent.futures
import os
import shutil

import pytest

from stlt_tpu.data import _native_build as nb


@pytest.fixture()
def tiny_src(tmp_path):
    src = tmp_path / "tiny.cpp"
    src.write_text('extern "C" int forty_two() { return 42; }\n')
    return str(src), str(tmp_path / "tiny.so")


def test_build_and_load(tiny_src):
    src, lib = tiny_src
    handle = nb.load_shared_library(src, lib)
    if handle is None:
        pytest.skip("no g++ toolchain")
    assert handle.forty_two() == 42


def test_concurrent_forced_builds_always_yield_loadable_lib(tiny_src):
    src, lib = tiny_src
    if nb.build_shared_library(src, lib) is None:
        pytest.skip("no g++ toolchain")

    def build_and_load(_):
        path = nb.build_shared_library(src, lib, force=True)
        assert path is not None
        import ctypes

        return ctypes.CDLL(path).forty_two()

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(build_and_load, range(8)))
    assert results == [42] * 8
    # no stray temp build files left behind
    leftovers = [f for f in os.listdir(os.path.dirname(lib)) if ".build." in f]
    assert leftovers == []


def test_missing_compiler_returns_none(tiny_src, monkeypatch):
    src, lib = tiny_src
    if os.path.exists(lib):
        os.remove(lib)
    monkeypatch.setenv("PATH", "/nonexistent")
    monkeypatch.setattr(shutil, "which", lambda *_: None, raising=False)
    assert nb.build_shared_library(src, lib) is None
    assert nb.load_shared_library(src, lib) is None


def test_corrupt_library_load_returns_none(tmp_path):
    src = tmp_path / "x.cpp"
    src.write_text('extern "C" int f() { return 1; }\n')
    lib = tmp_path / "x.so"
    lib.write_bytes(b"not an elf")
    os.utime(lib, (2**31 - 1, 2**31 - 1))  # newer than src: no rebuild
    assert nb.load_shared_library(str(src), str(lib)) is None
