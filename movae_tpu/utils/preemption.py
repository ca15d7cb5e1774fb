"""Preemption-tolerant training: SIGTERM-triggered graceful checkpointing.

TPU pod slices are routinely preempted (maintenance, spot reclaim) with a
short grace period. The reference framework has no story here — a killed
run restarts from scratch (SURVEY.md §5 "no mid-epoch resume"). Here a
signal handler records the request and the training loop checkpoints at
the next safe point and exits with code 143 (128+SIGTERM), so a scheduler
retry with ``--resume <save_root>/checkpoints/last_checkpoint`` continues
from the interrupted epoch.

Safety model: the handler only sets a flag (async-signal-safe for Python's
deferred handlers). Single-host runs also poll the flag between step
dispatches inside the epoch; multi-host runs only act on it at epoch
boundaries through :meth:`PreemptionGuard.globally_triggered` — a
per-step local break on one host would desynchronize the collective
schedule and hang the others.
"""

from __future__ import annotations

import signal
import threading


class PreemptionGuard:
    """Installs handlers for ``signals`` (default SIGTERM) on the main
    thread; exposes the local flag and a multi-host OR of it."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self._flag = False
        self._installed = []
        if threading.current_thread() is threading.main_thread():
            for s in signals:
                try:
                    prev = signal.signal(s, self._handle)
                    self._installed.append((s, prev))
                except (ValueError, OSError):  # pragma: no cover
                    pass

    def _handle(self, signum, frame):
        self._flag = True
        print(f"[movae_tpu] received signal {signum}: will write a "
              "resumable checkpoint at the next safe point and exit",
              flush=True)

    @property
    def triggered(self) -> bool:
        return self._flag

    def globally_triggered(self) -> bool:
        """True when ANY host has been signalled (epoch-boundary check;
        all hosts must agree before breaking the collective cadence)."""
        import jax

        if jax.process_count() == 1:
            return self._flag
        import numpy as np
        from jax.experimental import multihost_utils

        return bool(multihost_utils.process_allgather(
            np.asarray(self._flag)).any())

    def uninstall(self) -> None:
        for s, prev in self._installed:
            try:
                signal.signal(s, prev)
            except (ValueError, OSError):  # pragma: no cover
                pass
        self._installed = []
