#!/usr/bin/env python
"""Shim: the k-fold hyperopt sweep CLI.

The implementation lives in irp_tpu/cli/hyperopt_cli.py so the installed
package exposes it as the `irp-hyperopt` console script; this file keeps
the documented `python run_hyperopt.py ...` invocation (and
`import run_hyperopt`) working in a checkout.
"""

from irp_tpu.cli.hyperopt_cli import *  # noqa: F401,F403
from irp_tpu.cli.hyperopt_cli import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
