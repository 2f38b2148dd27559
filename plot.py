#!/usr/bin/env python
"""Repo-root wrapper: python plot.py --experiments Ours G-PCC"""
from lcpcga_tpu.cli.plot import main

if __name__ == "__main__":
    main()
