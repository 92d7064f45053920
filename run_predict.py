#!/usr/bin/env python
"""Shim: the batch prediction / export CLI.

The implementation lives in irp_tpu/cli/predict_cli.py so the installed
package exposes it as the `irp-predict` console script; this file keeps
the documented `python run_predict.py ...` invocation (and
`import run_predict`) working in a checkout.
"""

from irp_tpu.cli.predict_cli import *  # noqa: F401,F403
from irp_tpu.cli.predict_cli import main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
