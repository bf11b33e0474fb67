"""Training-event scalar storage and writers.

Fresh implementation of the reference's event system
(reference: pointcept/utils/events.py — EventStorage:290-502,
HistoryBuffer:527-590, JSONWriter:58, CommonMetricPrinter:188).
A context-managed ``EventStorage`` collects named scalars per iteration;
``HistoryBuffer`` keeps a bounded history for windowed medians/averages;
writers flush to JSON lines or TensorBoard (if installed).
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, List, Optional, Tuple

_CURRENT_STORAGE_STACK: List["EventStorage"] = []


def get_event_storage() -> "EventStorage":
    assert _CURRENT_STORAGE_STACK, "get_event_storage() called outside EventStorage ctx"
    return _CURRENT_STORAGE_STACK[-1]


class HistoryBuffer:
    """Bounded scalar history with running statistics."""

    def __init__(self, max_length: int = 1000000):
        self._max_length = max_length
        self._data: List[Tuple[float, float]] = []  # (value, iteration)
        self._count = 0
        self._global_avg = 0.0

    def update(self, value: float, iteration: Optional[float] = None):
        if iteration is None:
            iteration = self._count
        if len(self._data) == self._max_length:
            self._data.pop(0)
        self._data.append((value, iteration))
        self._count += 1
        self._global_avg += (value - self._global_avg) / self._count

    def latest(self) -> float:
        return self._data[-1][0]

    def median(self, window_size: int) -> float:
        vals = sorted(v for v, _ in self._data[-window_size:])
        return vals[len(vals) // 2]

    def avg(self, window_size: int) -> float:
        vals = [v for v, _ in self._data[-window_size:]]
        return sum(vals) / len(vals)

    def global_avg(self) -> float:
        return self._global_avg

    def values(self) -> List[Tuple[float, float]]:
        return self._data


class AverageMeter:
    """Running mean meter (reference: pointcept/utils/events.py:505)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class EventStorage:
    def __init__(self, start_iter: int = 0):
        self._iter = start_iter
        self._history: Dict[str, HistoryBuffer] = defaultdict(HistoryBuffer)
        self._smoothing_hints: Dict[str, bool] = {}
        self._latest_scalars: Dict[str, Tuple[float, int]] = {}

    # -- write API --
    def put_scalar(self, name: str, value: float, smoothing_hint: bool = True):
        value = float(value)
        self._history[name].update(value, self._iter)
        self._latest_scalars[name] = (value, self._iter)
        self._smoothing_hints[name] = smoothing_hint

    def put_scalars(self, *, smoothing_hint: bool = True, **kwargs):
        for k, v in kwargs.items():
            self.put_scalar(k, v, smoothing_hint=smoothing_hint)

    # -- read API --
    def history(self, name: str) -> HistoryBuffer:
        if name not in self._history:
            raise KeyError(f"no history for {name}")
        return self._history[name]

    def histories(self) -> Dict[str, HistoryBuffer]:
        return self._history

    def latest(self) -> Dict[str, Tuple[float, int]]:
        return self._latest_scalars

    def latest_with_smoothing_hint(self, window_size: int = 20):
        out = {}
        for k, (v, it) in self._latest_scalars.items():
            out[k] = (
                self._history[k].median(window_size) if self._smoothing_hints[k] else v,
                it,
            )
        return out

    @property
    def iter(self) -> int:
        return self._iter

    @iter.setter
    def iter(self, val: int):
        self._iter = int(val)

    def step(self):
        self._iter += 1

    @contextmanager
    def name_scope(self, name: str):
        old = getattr(self, "_current_prefix", "")
        self._current_prefix = f"{old}{name}/"
        try:
            yield
        finally:
            self._current_prefix = old

    def __enter__(self):
        _CURRENT_STORAGE_STACK.append(self)
        return self

    def __exit__(self, *args):
        assert _CURRENT_STORAGE_STACK[-1] is self
        _CURRENT_STORAGE_STACK.pop()


class EventWriter:
    def write(self, storage: EventStorage):
        raise NotImplementedError

    def close(self):
        pass


class JSONWriter(EventWriter):
    """Writes latest scalars as JSON lines (one object per flush)."""

    def __init__(self, json_file: str, window_size: int = 20):
        os.makedirs(os.path.dirname(os.path.abspath(json_file)), exist_ok=True)
        self._file = open(json_file, "a")
        self._window_size = window_size

    def write(self, storage: EventStorage):
        rec = {"iteration": storage.iter, "time": time.time()}
        for k, (v, _) in storage.latest_with_smoothing_hint(self._window_size).items():
            rec[k] = v
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()

    def close(self):
        self._file.close()


class TensorboardWriter(EventWriter):
    """TensorBoard scalars; silently disabled if no writer backend exists."""

    def __init__(self, log_dir: str, window_size: int = 20):
        self._window_size = window_size
        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # torch is baked in

            self._writer = SummaryWriter(log_dir)
        except Exception:
            try:
                from tensorboardX import SummaryWriter

                self._writer = SummaryWriter(log_dir)
            except Exception:
                self._writer = None
        self._last_write: Dict[str, int] = {}

    def add_scalar(self, name: str, value: float, step: int):
        if self._writer is not None:
            self._writer.add_scalar(name, value, step)

    def write(self, storage: EventStorage):
        if self._writer is None:
            return
        for k, (v, it) in storage.latest_with_smoothing_hint(self._window_size).items():
            if self._last_write.get(k, -1) < it:
                self._writer.add_scalar(k, v, it)
                self._last_write[k] = it

    def close(self):
        if self._writer is not None:
            self._writer.close()
