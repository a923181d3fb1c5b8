"""Training entry point (reference contract: tools/train.py:17-34)."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointcloudpdf_tpu.engines import (
    default_argument_parser,
    default_config_parser,
    default_setup,
    launch,
)
from pointcloudpdf_tpu.engines.train import TRAINERS


def main_worker(cfg):
    cfg = default_setup(cfg)
    trainer = TRAINERS.build(dict(type=cfg.get("train", {}).get("type", "DefaultTrainer"), cfg=cfg))
    trainer.train()


def main():
    args = default_argument_parser().parse_args()
    cfg = default_config_parser(args.config_file, args.options)
    launch(main_worker, num_gpus_per_machine=args.num_gpus, cfg=(cfg,))


if __name__ == "__main__":
    main()
