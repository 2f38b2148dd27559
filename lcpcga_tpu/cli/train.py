"""Training CLI: ``python train.py --config=./configs/ours.yaml``
(same surface as /root/reference/train.py:323-339)."""

from __future__ import annotations

import argparse

from ..training.trainer import Training
from ..utils import load_config


def main(argv=None):
    ap = argparse.ArgumentParser(description="Train the lcpcga_tpu codec")
    ap.add_argument("--config", required=True, help="training YAML (reference schema)")
    ap.add_argument("--mesh", action="store_true",
                    help="shard the batch over all visible devices")
    args = ap.parse_args(argv)
    config = load_config(args.config)
    trainer = Training(config, use_mesh=args.mesh)
    trainer.train()


if __name__ == "__main__":
    main()
