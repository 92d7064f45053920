"""Build hook: compile the native JPEG decoder into the package.

All project metadata lives in pyproject.toml; this file only teaches
setuptools to compile ``native/decode.cpp`` into
``irp_tpu/_native/libirpdecode.so`` during the build.  The library is a
plain C shared object loaded via ctypes (irp_tpu/data/jpeg.py), not a
CPython extension module, so a custom build_py step invoking the
compiler directly is simpler and more portable than abusing
``setuptools.Extension``.  Compilation is best-effort: without a C++
toolchain or libjpeg headers the build proceeds and the runtime falls
back to the PIL decoder.
"""

import os
import shutil
import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "native", "decode.cpp")


def _compile_decoder(out_dir: str) -> bool:
    cxx = os.environ.get("CXX", "g++")
    if not os.path.exists(SRC) or shutil.which(cxx) is None:
        return False
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


setup(cmdclass={"build_py": BuildPyWithNative})
