"""Metrics/observability: TensorBoard-compatible scalar logging + throughput.

Replaces the reference's SummaryWriter-threaded-through-the-data-dict
pattern (ref: train.py:312-314,418-421) with an explicit writer. Writes the
same scalar families (loss/{train,test}, lr, g_norm, mace/{train,test},
loss_comp/*, feature_space/*, h/*). Uses torch.utils.tensorboard when the
tensorboard package is importable, always mirrors to JSONL (works headless),
and exposes a pairs/sec/chip throughput meter (BASELINE.md target metric).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    """JSONL scalar log (+opt-in TensorBoard).

    TensorBoard event writing is opt-in via BIHOME_TENSORBOARD=1: the
    torch/tensorboard record writer blocks for tens of seconds per write in
    this image (profiled), and JSONL covers headless analysis. Device arrays
    are fetched with ONE device_get per call — per-scalar float() costs a
    full device round-trip each (~130ms over the TPU tunnel).
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, 'metrics.jsonl'), 'a')
        self._tb = None
        if os.environ.get('BIHOME_TENSORBOARD'):
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Dict) -> None:
        import jax
        host = jax.device_get(values)
        rec = {'step': int(step)}
        rec.update({k: float(v) for k, v in host.items()})
        self._jsonl.write(json.dumps(rec) + '\n')
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in host.items():
                self._tb.add_scalar(k, float(v), int(step))

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class NullWriter:
    """No-op writer for non-main processes under --multihost: metrics are
    replicated across ranks, so only process 0 writes (the reference gates
    its SummaryWriter the same way via is_main_process,
    ref: src/utils/dist_util.py:30-36)."""

    def scalars(self, step, values) -> None:
        pass

    def flush(self) -> None:
        pass

    def close(self) -> None:
        pass


class ThroughputMeter:
    """pairs/sec/chip, warmup-dropped (the BASELINE.json headline metric)."""

    def __init__(self, num_chips: int = 1, warmup_steps: int = 1):
        self.num_chips = max(1, num_chips)
        self.warmup_steps = warmup_steps
        self._count = 0
        self._pairs = 0
        self._start: Optional[float] = None

    def step(self, batch_pairs: int) -> None:
        self._count += 1
        if self._count == self.warmup_steps:
            self._start = time.perf_counter()
            self._pairs = 0
        elif self._count > self.warmup_steps:
            self._pairs += batch_pairs

    def pairs_per_sec_per_chip(self) -> float:
        if self._start is None or self._pairs == 0:
            return 0.0
        elapsed = time.perf_counter() - self._start
        return self._pairs / elapsed / self.num_chips
