#!/usr/bin/env python
"""Shim: the final training + full evaluation CLI.

The implementation lives in irp_tpu/cli/final_cli.py so the installed
package exposes it as the `irp-final` console script; this file keeps
the documented `python run_final.py ...` invocation (and
`import run_final`) working in a checkout.
"""

from irp_tpu.cli.final_cli import *  # noqa: F401,F403
from irp_tpu.cli.final_cli import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
