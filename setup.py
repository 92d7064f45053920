"""Build hook: compile the native JPEG decoder into the package.

All project metadata lives in pyproject.toml; this file only teaches
setuptools to compile ``native/decode.cpp`` into
``irp_tpu/_native/libirpdecode.so`` during the build.  The library is a
plain C shared object loaded via ctypes (irp_tpu/data/jpeg.py), not a
CPython extension module, so a custom build_py step invoking the
compiler directly is simpler and more portable than abusing
``setuptools.Extension``.  Compilation is best-effort: without a C++
toolchain or libjpeg headers the build proceeds and the runtime falls
back to the PIL decoder.  The decoder sources ride along in
``irp_tpu/_native/`` so a user can rebuild in place
(``g++ -O3 -fPIC -shared -std=c++17 decode.cpp -o libirpdecode.so
-ljpeg -lpthread``).
"""

import os
import shutil
import subprocess
import sys

from setuptools import setup
from setuptools.dist import Distribution
from setuptools.command.build_py import build_py

HERE = os.path.dirname(os.path.abspath(__file__))
NATIVE_DIR = os.path.join(HERE, "native")
SRC = os.path.join(NATIVE_DIR, "decode.cpp")


def _toolchain_present() -> bool:
    return (os.path.exists(SRC)
            and shutil.which(os.environ.get("CXX", "g++")) is not None)


def _compile_decoder(out_dir: str) -> bool:
    if not _toolchain_present():
        return False
    cxx = os.environ.get("CXX", "g++")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "libirpdecode.so")
    march = os.environ.get("IRP_NATIVE_MARCH", "x86-64-v2")
    cmd = [cxx, "-O3", f"-march={march}", "-fPIC", "-std=c++17", "-Wall",
           SRC, "-o", out, "-shared", "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, OSError) as e:
        msg = getattr(e, "stderr", "") or str(e)
        print(f"warning: native decoder build skipped ({msg.strip()[:200]}); "
              "runtime will use the PIL fallback", file=sys.stderr)
        return False
    return True


class BuildPyWithNative(build_py):
    def run(self):
        super().run()
        pkg_native = os.path.join(self.build_lib, "irp_tpu", "_native")
        _compile_decoder(pkg_native)
        # Ship the decoder sources inside the package (matching the
        # package-data patterns in pyproject.toml) so a wheel built
        # without a toolchain still lets the user compile later.
        if os.path.isdir(NATIVE_DIR):
            os.makedirs(pkg_native, exist_ok=True)
            for fname in ("decode.cpp", "Makefile"):
                src = os.path.join(NATIVE_DIR, fname)
                if os.path.exists(src):
                    shutil.copy2(src, os.path.join(pkg_native, fname))


class DistWithNative(Distribution):
    """Tag the dist platform-specific whenever it may carry the
    compiled decoder.

    The probe is the same precondition ``_compile_decoder`` uses, so it
    can only over-approximate (toolchain present but libjpeg missing →
    a pure wheel with a platform tag — harmless).  The reverse — an
    arch-specific .so inside a ``py3-none-any`` wheel — would silently
    drop the native decoder on every other machine: ctypes fails to
    load the foreign-arch ELF and jpeg.py quietly falls back to PIL.
    """

    def has_ext_modules(self):
        return _toolchain_present()


try:  # moved into setuptools in 70.1; the wheel package before that
    from setuptools.command.bdist_wheel import bdist_wheel
except ImportError:  # pragma: no cover
    try:
        from wheel.bdist_wheel import bdist_wheel
    except ImportError:
        bdist_wheel = None

_cmds = {"build_py": BuildPyWithNative}
if bdist_wheel is not None:
    class BdistWheelNative(bdist_wheel):
        def get_tag(self):
            python, abi, plat = super().get_tag()
            if _toolchain_present():
                # libirpdecode.so is ctypes-loaded, not a CPython
                # extension: platform-specific but interpreter/ABI-
                # agnostic (cpNN-cpNN would wrongly pin the python
                # minor version)
                return "py3", "none", plat
            return python, abi, plat

    _cmds["bdist_wheel"] = BdistWheelNative

setup(cmdclass=_cmds, distclass=DistWithNative)
