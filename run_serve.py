#!/usr/bin/env python
"""Shim: the online inference daemon CLI.

The implementation lives in irp_tpu/cli/serve_cli.py so the installed
package exposes it as the `irp-serve` console script; this file keeps
the documented `python run_serve.py ...` invocation (and
`import run_serve`) working in a checkout.
"""

from irp_tpu.cli.serve_cli import *  # noqa: F401,F403
from irp_tpu.cli.serve_cli import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
