#!/usr/bin/env python
"""Shim: the terminal tracking/study dashboard CLI.

The implementation lives in irp_tpu/cli/dashboard_cli.py so the installed
package exposes it as the `irp-dashboard` console script; this file keeps
the documented `python run_dashboard.py ...` invocation (and
`import run_dashboard`) working in a checkout.
"""

from irp_tpu.cli.dashboard_cli import *  # noqa: F401,F403
from irp_tpu.cli.dashboard_cli import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
