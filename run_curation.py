#!/usr/bin/env python
"""Shim: the dataset curation pipeline CLI.

The implementation lives in irp_tpu/cli/curation_cli.py so the installed
package exposes it as the `irp-curation` console script; this file keeps
the documented `python run_curation.py ...` invocation (and
`import run_curation`) working in a checkout.
"""

from irp_tpu.cli.curation_cli import *  # noqa: F401,F403
from irp_tpu.cli.curation_cli import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
