"""Metrics logging (SURVEY.md §5 "Metrics / logging / observability").

Rebuild of the reference's ``netmisc.print_metrics`` behavior: structured
per-step metrics to a stream as JSONL, plus an optional TensorBoard writer
(the reference had none; tensorboard is available in this image)."""

from __future__ import annotations

import json
import sys
from typing import IO


class MetricsLogger:
    def __init__(self, stream: IO | None = None, tb_logdir: str | None = None):
        self.stream = stream if stream is not None else sys.stdout
        self._tb = None
        if tb_logdir:
            try:
                from torch.utils.tensorboard import SummaryWriter  # in-image

                self._tb = SummaryWriter(tb_logdir)
            except Exception:
                try:
                    import tensorflow  # noqa: F401
                    from tensorboard.summary import Writer

                    self._tb = Writer(tb_logdir)
                except Exception:
                    self._tb = None

    def log(self, step: int, metrics: dict) -> None:
        def coerce(v):
            try:
                return float(v)
            except (TypeError, ValueError):
                return v  # pass strings/paths through to the JSONL record

        rec = {"step": step, **{k: coerce(v) for k, v in metrics.items()}}
        self.stream.write(json.dumps(rec) + "\n")
        self.stream.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k == "step" or not isinstance(v, float):
                    continue
                try:
                    self._tb.add_scalar(k, v, step)
                except AttributeError:
                    self._tb.add_scalar(k, v, step=step)
            try:
                self._tb.flush()
            except Exception:
                pass

    def close(self) -> None:
        if self._tb is not None:
            try:
                self._tb.close()
            except Exception:
                pass
