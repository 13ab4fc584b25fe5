"""Frame pacing: the latency-waitable swap chain analog.

`FrameLatencyQueue` reproduces `SetMaximumFrameLatency`
(`Render.cpp:298-308`; wait handle consumed in `UpdateCamera`,
`Render.cpp:763-767`): the frame loop may dispatch ahead, but never more
than `max_latency` unconfirmed frames. Each dispatched frame contributes a
tiny async "fence marker" (a 1-element slice of the frame's output,
enqueued before any later donation can retire the buffer). A waiter thread
confirms completions off the critical path: it blocks on the NEWEST
pending marker (device streams are FIFO, so that confirms every older
frame too — one host round-trip covers the whole backlog) and wakes the
frame loop, which only sleeps when `dispatched - confirmed > max_latency`.
On a local TPU the confirmation lag is microseconds and the bound is
exact; over a tunneled transport the batch-confirm keeps throughput at
dispatch-ahead speed while the worst-case in-flight latency stays
max(max_latency frames, one host round-trip of frames).

Per-stage device timing lives in `runtime/gputimer.py` (profiler-plane
based): marker-completion timing cannot resolve sub-frame stages over a
batched transport — measured: completion visibility quantizes to whole
dispatch groups — so stage timing uses the XLA profiler's device clock
instead.
"""

from __future__ import annotations

import threading
from collections import deque
from typing import Optional

from multi_adapter_particles_tpu.utils.timers import sync


def fence_marker(x):
    """A tiny async slice depending on `x`'s completion.

    Enqueued on the main thread immediately, so it is ordered BEFORE any
    later donating dispatch that would retire `x` itself; blocking on the
    marker later is therefore always safe and waits for the producing
    program of `x` (single FIFO stream per device).
    """
    return x[tuple(slice(0, 1) for _ in range(x.ndim))]


class FrameLatencyQueue:
    """Bounded in-flight frame depth (SetMaximumFrameLatency analog)."""

    def __init__(self, max_latency: int = 2):
        self.max_latency = max(1, int(max_latency))
        self._cond = threading.Condition()
        self._pending: deque = deque()  # (seq, marker), FIFO
        self._seq = 0
        self._confirmed = 0
        self._closed = False
        self._thread: Optional[threading.Thread] = None

    def __len__(self) -> int:
        """Frames dispatched but not yet confirmed complete."""
        with self._cond:
            return self._seq - self._confirmed

    def _ensure_thread(self) -> None:
        if self._thread is None or not self._thread.is_alive():
            self._closed = False
            self._thread = threading.Thread(
                target=self._run, name="frame-latency-waiter", daemon=True
            )
            self._thread.start()

    def _run(self) -> None:
        while True:
            with self._cond:
                while not self._pending and not self._closed:
                    self._cond.wait()
                if not self._pending and self._closed:
                    return
                # Confirm the whole backlog with ONE wait: FIFO execution
                # means the newest marker completing implies all older ones.
                seq, marker = self._pending[-1]
                self._pending.clear()
            sync(marker)
            with self._cond:
                self._confirmed = max(self._confirmed, seq)
                self._cond.notify_all()

    def push(self, frame_output) -> None:
        """Register a just-dispatched frame; block only while more than
        `max_latency` frames remain unconfirmed."""
        marker = fence_marker(frame_output)
        self._ensure_thread()
        with self._cond:
            self._seq += 1
            self._pending.append((self._seq, marker))
            self._cond.notify_all()
            while self._seq - self._confirmed > self.max_latency:
                self._cond.wait()

    def drain(self) -> None:
        """Block until every registered frame has been confirmed."""
        with self._cond:
            while self._confirmed < self._seq:
                self._cond.notify_all()
                self._cond.wait(timeout=0.1)

    def close(self) -> None:
        self.drain()
        with self._cond:
            self._closed = True
            self._cond.notify_all()
        if self._thread is not None:
            self._thread.join(timeout=10.0)
            self._thread = None
