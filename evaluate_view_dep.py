#!/usr/bin/env python
"""Repo-root wrapper: python evaluate_view_dep.py --experiment=Ours"""
from lcpcga_tpu.cli.evaluate_view_dep import main

if __name__ == "__main__":
    main()
