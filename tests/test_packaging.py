"""The repo is an installable package (pip wheel + console entry points).

The reference ships only a requirements.txt (reference requirements.txt);
a standalone framework must install.  These tests build a real wheel with
pip (offline: --no-deps --no-build-isolation) and assert the package
contents, the seven console-script entry points, and that the native
decoder compiled into the wheel loads from the installed layout
(irp_tpu/data/jpeg.py::_lib_path's package-local probe).
"""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def wheel_path(tmp_path_factory):
    out = tmp_path_factory.mktemp("wheel")
    res = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "--quiet", "-w", str(out), REPO],
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, f"pip wheel failed:\n{res.stderr[-2000:]}"
    wheels = [p for p in os.listdir(out) if p.endswith(".whl")]
    assert len(wheels) == 1, wheels
    return os.path.join(out, wheels[0])


def test_wheel_contents(wheel_path):
    names = zipfile.ZipFile(wheel_path).namelist()
    # The package, the CLI modules, and no stray top-level run_* shims.
    assert "irp_tpu/__init__.py" in names
    for mod in ("hyperopt_cli", "curation_cli", "final_cli", "fidelity_cli",
                "dashboard_cli", "predict_cli", "serve_cli"):
        assert f"irp_tpu/cli/{mod}.py" in names
    assert not [n for n in names if n.startswith("run_")]
    # Entry points metadata.
    ep = next(n for n in names if n.endswith("entry_points.txt"))
    text = zipfile.ZipFile(wheel_path).read(ep).decode()
    for script in ("irp-hyperopt", "irp-curation", "irp-final",
                   "irp-fidelity", "irp-dashboard", "irp-predict",
                   "irp-serve"):
        assert script in text, f"{script} missing from entry_points"


def test_installed_package_imports_and_native_lib(wheel_path, tmp_path):
    site = tmp_path / "site"
    with zipfile.ZipFile(wheel_path) as zf:
        zf.extractall(site)
    have_toolchain = shutil.which(os.environ.get("CXX", "g++")) is not None
    native_in_wheel = (site / "irp_tpu" / "_native"
                       / "libirpdecode.so").exists()
    if have_toolchain:
        assert native_in_wheel, "toolchain present but wheel has no .so"
    # Import from the installed layout only (cwd pinned away from the
    # repo so 'irp_tpu' can't resolve to the checkout).
    code = (
        "import irp_tpu, os\n"
        "from irp_tpu.data import jpeg\n"
        "from irp_tpu.cli.hyperopt_cli import main\n"
        "assert os.path.realpath(irp_tpu.__file__).startswith("
        f"os.path.realpath({str(site)!r}))\n"
        f"assert jpeg.native_decoder_available() == {native_in_wheel}\n"
        "print('INSTALLED_OK')\n"
    )
    env = dict(os.environ, PYTHONPATH=str(site))
    res = subprocess.run([sys.executable, "-c", code], cwd=str(tmp_path),
                         capture_output=True, text=True, timeout=300,
                         env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "INSTALLED_OK" in res.stdout
