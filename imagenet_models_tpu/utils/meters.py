"""Metering/logging utilities (timm AverageMeter/accuracy analogs,
used throughout the reference engines, e.g. /root/reference/GA/train.py:712-714)."""

from __future__ import annotations

import csv
import logging
import os
from collections import OrderedDict
from typing import Dict, Optional


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


def setup_default_logging(level=logging.INFO):
    # force=True: absl/jax may have already configured the root logger at
    # WARNING, which would silently swallow all engine INFO logs
    logging.basicConfig(level=level, force=True,
                        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    logging.getLogger("absl").setLevel(logging.WARNING)  # orbax save chatter
    logging.getLogger("jax").setLevel(logging.WARNING)


try:
    import wandb

    HAS_WANDB = True
except ImportError:  # optional, like the reference (GA/train.py:37-43)
    wandb = None
    HAS_WANDB = False


def init_wandb(project: str, run_name: str, config: Dict, resume_id: Optional[str] = None):
    if not HAS_WANDB:
        logging.getLogger(__name__).warning(
            "You've requested to log metrics to wandb but package not found. "
            "Metrics not being logged to wandb, try `pip install wandb`")
        return False
    if resume_id:
        wandb.init(project=project, name=run_name, config=config, resume="must", id=resume_id)
    else:
        wandb.init(project=project, name=run_name, config=config)
    return True


def update_summary(epoch: int, train_metrics: Dict, eval_metrics: Dict,
                   filename: str, write_header: bool = False, lr: Optional[float] = None,
                   log_wandb: bool = False):
    """Per-epoch summary.csv like timm update_summary
    (/root/reference/GA/train.py:685-688), optional wandb mirroring."""
    rowd = OrderedDict(epoch=epoch)
    rowd.update([("train_" + k, v) for k, v in train_metrics.items()])
    rowd.update([("eval_" + k, v) for k, v in eval_metrics.items()])
    if lr is not None:
        rowd["lr"] = lr
    if log_wandb and HAS_WANDB:
        wandb.log(dict(rowd))
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    with open(filename, "a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rowd.keys()))
        if write_header:
            writer.writeheader()
        writer.writerow(rowd)
