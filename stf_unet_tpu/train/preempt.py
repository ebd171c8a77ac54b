"""Graceful preemption and step-boxed training (no reference counterpart).

TPU VMs receive SIGTERM with a short grace window before maintenance or
spot reclamation; the reference trainer (ref:train.py:124-401) would die
mid-epoch and lose everything since the last epoch-end save.
`PreemptionGuard` turns the signal (or a configured `--stop-after-steps`
budget) into a coordinated stop at the next train-step boundary, so
`cli/train.py` can write a STEP-EXACT checkpoint (`epoch` +
`step_in_epoch` in the meta sidecar) and exit cleanly. `--resume` then
re-enters the same epoch at the interrupted step: the seeded per-epoch
shuffle reproduces the exact remaining batches (HostLoader.epoch
skip_batches) and the per-(epoch, step) PRNG stream reproduces the exact
augmentation keys, so a preempted-and-resumed run is bit-identical to an
uninterrupted one (tests/test_preemption.py).

Multi-host: a signal lands on ONE host, but orbax saves barrier across
ALL processes — a unilateral stop would deadlock the save. should_stop()
therefore returns the globally AGREED decision: every host calls it at
the same step index and the local flags all-reduce (max), so all hosts
break at the same boundary and reach the coordinated save together.
"""

from __future__ import annotations

import signal
import threading

import numpy as np

_SIGNALS = (signal.SIGTERM, signal.SIGINT)


class PreemptionGuard:
    """Stop-flag with signal capture and cross-host agreement.

    `stop_after_steps > 0` also raises the flag after that many completed
    train steps — a step-boxed run (time-boxed TPU reservations) that
    always ends in a resumable step-exact checkpoint, and the
    deterministic test hook for the signal path.
    """

    def __init__(self, num_hosts: int = 1, stop_after_steps: int = 0):
        self._event = threading.Event()
        self._num_hosts = int(num_hosts)
        self._stop_after = int(stop_after_steps)
        self._steps = 0
        self._agreed = False
        self._installed = []
        try:
            for sig in _SIGNALS:
                self._installed.append((sig, signal.signal(sig,
                                                           self._handle)))
        except ValueError:
            # signal.signal is main-thread-only; when a harness drives
            # main() from a worker thread the step-budget path still works.
            self._installed = []

    def _handle(self, signum, frame):
        if self._event.is_set() and signum == signal.SIGINT:
            raise KeyboardInterrupt  # second Ctrl-C: abort immediately
        self._event.set()

    def uninstall(self) -> None:
        for sig, prev in self._installed:
            signal.signal(sig, prev)
        self._installed = []

    def should_stop(self, increment: bool = True) -> bool:
        """The globally agreed stop decision.

        Call with increment=True exactly once per completed train step —
        on EVERY host, at the same step index (train_one_epoch does
        this); increment=False polls at other all-host-aligned points
        (end of epoch). Multi-host agreement is a 1-int32-per-host
        allgather — sub-ms next to a train step."""
        if increment:
            self._steps += 1
        local = self._event.is_set() or (0 < self._stop_after <=
                                         self._steps)
        if self._num_hosts <= 1:
            self._agreed = bool(local)
        else:
            from jax.experimental import multihost_utils
            flags = multihost_utils.process_allgather(
                np.asarray([local], dtype=np.int32))
            self._agreed = bool(np.asarray(flags).max())
        return self._agreed

    @property
    def triggered(self) -> bool:
        """True once should_stop() has returned an agreed stop."""
        return self._agreed
