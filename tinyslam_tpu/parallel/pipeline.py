"""Front-end / back-end pipelining (the PP analog of SURVEY §2d).

SLAM has one latency-critical stage (per-frame tracking) and one
throughput stage (global pose-graph optimization after a loop closure).
The reference runs everything on one queue with a blocking wait per frame
(reference src/orb.rs:541-547); here the two stages decouple: tracking
keeps dispatching while the back-end optimizes on a worker thread, and the
correction is applied at the next frame boundary.

JAX specifics that make this safe and cheap:

- jitted computations are thread-safe; the worker only *dispatches* XLA
  executables and blocks on their results, so the GIL is released during
  device execution and the tracker thread keeps feeding the device;
- the job slot is latest-wins: if loop closures arrive faster than the
  back-end solves them, intermediate graph snapshots are superseded rather
  than queued (the newest snapshot subsumes older ones — it contains every
  edge the older ones had).
"""

from __future__ import annotations

import threading
from typing import Any, Callable, Optional


class AsyncWorker:
    """Single background worker with a latest-wins job slot.

    submit(fn)  — schedule fn() on the worker; replaces any job not yet
                  started (the newer snapshot subsumes the older).
    poll()      — non-blocking: the newest finished result, or None.
    flush()     — block until no job is pending or running, return poll().
    close()     — stop the thread (pending job is dropped).
    """

    def __init__(self, name: str = "tinyslam-backend"):
        self._cond = threading.Condition()
        self._job: Optional[Callable[[], Any]] = None
        self._running = False
        self._result: Any = None
        self._has_result = False
        self._closed = False
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, name=name,
                                        daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            with self._cond:
                while self._job is None and not self._closed:
                    self._cond.wait()
                if self._closed:
                    return
                fn = self._job
                self._job = None
                self._running = True
            try:
                out = fn()
                err = None
            except BaseException as e:  # surfaced on next poll()
                out, err = None, e
            with self._cond:
                self._running = False
                if err is not None:
                    self._error = err
                else:
                    self._result = out
                    self._has_result = True
                self._cond.notify_all()

    def submit(self, fn: Callable[[], Any]) -> None:
        with self._cond:
            if self._closed:
                raise RuntimeError("worker is closed")
            self._job = fn
            self._cond.notify_all()

    def poll(self):
        with self._cond:
            if self._error is not None:
                err, self._error = self._error, None
                raise err
            if self._has_result:
                self._has_result = False
                out, self._result = self._result, None
                return out
            return None

    def flush(self):
        with self._cond:
            while self._job is not None or self._running:
                self._cond.wait()
        return self.poll()

    @property
    def busy(self) -> bool:
        with self._cond:
            return self._job is not None or self._running

    def close(self):
        with self._cond:
            self._closed = True
            self._job = None
            self._cond.notify_all()
        self._thread.join(timeout=5.0)
