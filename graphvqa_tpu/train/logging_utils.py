"""Host-side progress meters.

Equivalents of the reference's ``AverageMeter`` / ``ProgressMeter`` /
``SmoothedValue`` / ``MetricLogger`` (mainExplain_gat.py:948-993,
util/misc.py:26-245). Cross-process reduction: DP *train* metrics arrive
already psummed in-graph over the mesh (parallel/data_parallel.py), while
*validate* computes per-row metrics host-side per process —
``AverageMeter.synchronize()`` (the SmoothedValue.synchronize_between_processes
equivalent, util/misc.py:44-55) folds those into global values.
"""
from __future__ import annotations

import datetime
import logging
import time
from collections import deque
from typing import Dict, Iterable, List


def get_sha() -> str:
    """Git provenance stamp for the run log header (reference:
    util/misc.py:248-265, printed at mainExplain_gat.py:149)."""
    import os
    import subprocess

    cwd = os.path.dirname(os.path.abspath(__file__))

    def _run(cmd):
        return subprocess.check_output(
            cmd, cwd=cwd, stderr=subprocess.DEVNULL).decode("ascii").strip()

    sha = branch = "N/A"
    diff = "clean"
    try:
        sha = _run(["git", "rev-parse", "HEAD"])
        diff = ("has uncommitted changes"
                if _run(["git", "diff-index", "HEAD"]) else "clean")
        branch = _run(["git", "rev-parse", "--abbrev-ref", "HEAD"])
    except Exception:
        pass
    return f"sha: {sha}, status: {diff}, branch: {branch}"


class AverageMeter:
    def __init__(self, name: str, fmt: str = ":f"):
        self.name, self.fmt = name, fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        # contributions gathered from OTHER processes by synchronize()
        self._ext_sum = 0.0
        self._ext_count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    def synchronize(self):
        """Fold in every other process's (sum, count) so avg is global
        (reference SmoothedValue.synchronize_between_processes,
        util/misc.py:44-55). Repeat-safe: local updates stay local and the
        foreign contribution is recomputed from scratch each call, so this
        can run before every display. COLLECTIVE: every process must call
        it the same number of times (iter_batches equalizes per-shard batch
        counts for exactly this reason)."""
        import jax
        if jax.process_count() == 1:
            return
        from graphvqa_tpu.parallel.collectives import all_gather_host
        parts = all_gather_host((self.sum, self.count))
        self._ext_sum = float(sum(p[0] for p in parts)) - self.sum
        self._ext_count = int(sum(p[1] for p in parts)) - self.count

    @property
    def avg(self) -> float:
        return ((self.sum + self._ext_sum)
                / max(self.count + self._ext_count, 1))

    @property
    def global_count(self) -> int:
        return self.count + self._ext_count

    def __str__(self):
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(name=self.name, val=self.val, avg=self.avg)


class ProgressMeter:
    def __init__(self, num_batches: int, meters: List[AverageMeter],
                 prefix: str = ""):
        num_digits = len(str(num_batches // 1))
        self.batch_fmtstr = "[{:" + str(num_digits) + "d}/" + str(num_batches) + "]"
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int):
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(m) for m in self.meters]
        line = "\t".join(entries)
        print(line)
        logging.info(line)


class SmoothedValue:
    """Windowed median/avg tracker (util/misc.py:26-85 sans dist sync)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / max(len(self.deque), 1)

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg,
                               value=self.deque[-1] if self.deque else 0.0)


class MetricLogger:
    def __init__(self, delimiter: str = "\t"):
        self.meters: Dict[str, SmoothedValue] = {}
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters.setdefault(k, SmoothedValue()).update(float(v))

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int, header: str = ""):
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        try:
            total = len(iterable)  # type: ignore[arg-type]
        except TypeError:
            total = None
        end = time.time()
        for obj in iterable:
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                if total:
                    eta = iter_time.global_avg * (total - i)
                    eta_str = str(datetime.timedelta(seconds=int(eta)))
                    msg = f"{header} [{i}/{total}] eta: {eta_str} {self} time: {iter_time}"
                else:
                    msg = f"{header} [{i}] {self} time: {iter_time}"
                print(msg)
                logging.info(msg)
            i += 1
            end = time.time()
        elapsed = str(datetime.timedelta(seconds=int(time.time() - start)))
        print(f"{header} Total time: {elapsed}")
