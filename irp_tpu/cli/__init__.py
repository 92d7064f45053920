"""Installable CLI entry points.

Each module here is the body of one of the repo-root ``run_*.py``
scripts (which remain as thin shims so ``python run_hyperopt.py ...``
keeps working in a checkout); packaging exposes them as console
scripts (``irp-hyperopt``, ``irp-curation``, ``irp-final``,
``irp-fidelity``, ``irp-dashboard``, ``irp-predict``, ``irp-serve``)
via ``pyproject.toml``.
"""
