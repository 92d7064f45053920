#!/usr/bin/env python
"""Shim: the torch-vs-JAX output fidelity check CLI.

The implementation lives in irp_tpu/cli/fidelity_cli.py so the installed
package exposes it as the `irp-fidelity` console script; this file keeps
the documented `python run_fidelity.py ...` invocation (and
`import run_fidelity`) working in a checkout.
"""

from irp_tpu.cli.fidelity_cli import *  # noqa: F401,F403
from irp_tpu.cli.fidelity_cli import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
