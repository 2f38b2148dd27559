#!/usr/bin/env python
"""Repo-root wrapper: python train.py --config=./configs/ours.yaml"""
from lcpcga_tpu.cli.train import main

if __name__ == "__main__":
    main()
