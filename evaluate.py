#!/usr/bin/env python
"""Repo-root wrapper: python evaluate.py --experiment=Ours"""
from lcpcga_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
