#!/usr/bin/env python
"""Repo-root launcher for the training CLI.

The implementation lives in uda_clr_tpu.cli (installed as the
``uda-clr-train`` console script); this shim keeps the reference-style
``python train.py ...`` invocation working from a source checkout
(mirrors /root/reference train_use_fix_initial.py's role as the
runnable entry point).
"""

from uda_clr_tpu.cli import build_config, main  # noqa: F401

if __name__ == "__main__":
    main()
