"""Training monitor: periodic timings/ELBO prints + optional TensorBoard.

TPU-native rebuild of gpflow:gpflow/training/monitor.py's task model
(PrintTimingsTask / ScalarFuncToTensorBoardTask — SURVEY.md §5) reduced to
what the harness actually used: steps/sec + objective on a cadence, scalars
to TensorBoard when a writer is available. steps/sec is the north-star
metric (BASELINE.md), so it is measured here, not ad hoc.
"""

from __future__ import annotations

import time
from typing import Callable


class Monitor:
    def __init__(self, print_every: int = 500, log_dir: str | None = None,
                 printer: Callable[[str], None] = print):
        self.print_every = print_every
        self.printer = printer
        self._t0 = None
        self._last_step = 0
        self._last_t = None
        self.history: list[dict] = []
        self._tb = None
        if log_dir is not None:
            try:  # TF is in the image; use its pure summary writer if present
                import tensorflow as tf  # type: ignore

                self._tb = tf.summary.create_file_writer(log_dir)
            except Exception:
                self._tb = None

    def __call__(self, step: int, loss: float, state=None) -> None:
        now = time.time()
        if self._t0 is None:
            # first record: no usable interval yet (and it would include
            # compile time anyway) — report rate 0, start the clock here
            self._t0 = now
            self._last_t = now
            self._last_step = step
        rate = (step - self._last_step) / max(now - self._last_t, 1e-9)
        rec = {"step": step, "elbo": -loss, "steps_per_sec": rate,
               "wall": now - self._t0}
        self.history.append(rec)
        if self._tb is not None:
            import tensorflow as tf  # type: ignore

            with self._tb.as_default():
                tf.summary.scalar("elbo", -loss, step=step)
                tf.summary.scalar("steps_per_sec", rate, step=step)
        if self.print_every and (step % self.print_every == 0
                                 or step - self._last_step >= self.print_every):
            self.printer(
                f"step {step:>8d}  elbo {-loss:>14.4f}  {rate:>8.1f} steps/s")
        self._last_step = step
        self._last_t = now

    @property
    def mean_steps_per_sec(self) -> float:
        if len(self.history) < 2:
            return float("nan")
        h0, h1 = self.history[0], self.history[-1]
        return (h1["step"] - h0["step"]) / max(h1["wall"] - h0["wall"], 1e-9)
