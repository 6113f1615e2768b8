"""Asynchronous pipeline orchestration: the reference's thread topology,
re-expressed for a host-orchestrated TPU pipeline.

The reference runs LocalMapping and LoopClosing on their own threads fed by
keyframe queues (LocalMapping::Run LocalMapping.cc:46-110, queue
mlNewKeyFrames LocalMapping.h:406; LoopClosing::Run LoopClosing.cc:58-89,
queue mlpLoopKeyFrameQueue LoopClosing.h:280), so tracking never waits on
keyframe-rate work. Here the same topology is host threads that orchestrate
device programs:

  Tracker (caller thread)
    -> MappingWorker thread: BoW + cull + triangulate + fuse + local BA + KF cull
       -> LoopWorker thread: detect + Sim3 + correct (+ detached GBA)

Synchronization is ONE map lock (the reference's Map::mMutexMapUpdate,
Map.h:140): every store mutation and every host-side read of mutable store
state happens under it. Crucially the workers do NOT hold it while device
programs execute — they assemble inputs under the lock, dispatch, release,
block on the device, and re-take the lock to write back (exactly g2o's
optimize-outside / apply-under-mutex pattern, Optimizer.cc:516).

Control protocol parity:
  * SetAcceptKeyFrames backpressure (LocalMapping.cc:53,101) ->
    MappingWorker.accepting / Tracker.mapping_idle_fn;
  * InterruptBA / mbAbortBA preemption (LocalMapping.cc:116; Tracking.cc:755)
    -> LocalMapper.abort_ba checked between LM chunks;
  * RequestStop/isStopped/Release (LocalMapping.cc:479-553) -> request_stop/
    wait_stopped/release, used by loop correction and map save;
  * RequestReset (LocalMapping.cc:614-631) -> request_reset;
  * RequestFinish/isFinished (LocalMapping.cc:633-667) -> shutdown.
"""
from __future__ import annotations

import threading
from collections import deque


class MappingWorker:
    """LocalMapping thread: consumes a keyframe queue, runs the full local
    mapping pass per keyframe, then hands the keyframe to the loop worker."""

    def __init__(self, mapper, lock, on_process=None, on_pass_done=None,
                 loop_worker=None):
        self.mapper = mapper
        self.lock = lock
        self.on_process = on_process  # callback(kf) pre-pass (BoW + db.add)
        self.on_pass_done = on_pass_done  # callback(kf) post-pass (publish)
        self.loop_worker = loop_worker
        self._queue: deque = deque()
        self._cv = threading.Condition()
        self._finishing = False
        self._stop_requested = False
        self._stopped = threading.Event()
        self._idle = threading.Event()
        self._idle.set()
        self._thread = threading.Thread(
            target=self._run, daemon=True, name="LocalMapping"
        )
        self._thread.start()

    # ---------------- producer side (tracker thread) -------------------- #
    def insert_keyframe(self, kf: int, bootstrap: bool = False) -> None:
        """Queue a keyframe (LocalMapping::InsertKeyFrame, LocalMapping.cc:112:
        also sets mbAbortBA so a running local BA yields)."""
        with self._cv:
            self._queue.append((kf, bootstrap))
            self.mapper.abort_ba = True
            self._idle.clear()
            self._cv.notify()

    def interrupt_ba(self) -> None:
        """Tracking::NeedNewKeyFrame's InterruptBA (Tracking.cc:755)."""
        self.mapper.abort_ba = True

    @property
    def accepting(self) -> bool:
        """SetAcceptKeyFrames state (LocalMapping.cc:53,101). Slightly more
        eager than the reference's mono rule (strictly idle): up to one
        keyframe may queue behind the in-flight pass — map coverage must not
        stall for the heavy stages, which the mapper itself SKIPS while the
        queue is non-empty (the reference's CheckNewKeyFrames gates,
        LocalMapping.cc:72), so a queued keyframe still gets its points
        triangulated promptly."""
        with self._cv:
            return not self._stop_requested and len(self._queue) < 2

    def queue_size(self) -> int:
        with self._cv:
            return len(self._queue)

    # ---------------- control protocol ---------------------------------- #
    def request_stop(self) -> None:
        """Pause processing (keyframes stay queued) — loop correction and
        map save need the mapper quiescent (LoopClosing.cc:413-431,
        Osmap.cpp:70-73)."""
        with self._cv:
            self._stop_requested = True
            self.mapper.abort_ba = True
            self._cv.notify()

    def wait_stopped(self, timeout: float | None = None) -> bool:
        return self._stopped.wait(timeout)

    def release(self) -> None:
        """Resume after request_stop (LocalMapping::Release)."""
        with self._cv:
            self._stop_requested = False
            self._stopped.clear()
            self._cv.notify()

    def request_reset(self) -> None:
        """Drop all queued keyframes (LocalMapping::RequestReset); the
        in-flight pass (if any) finishes with its BA aborted."""
        with self._cv:
            self._queue.clear()
            self.mapper.abort_ba = True

    def wait_idle(self, timeout: float | None = None) -> bool:
        """Block until the queue is drained and the current pass finished."""
        return self._idle.wait(timeout)

    def shutdown(self, timeout: float = 30.0) -> None:
        with self._cv:
            self._finishing = True
            self.mapper.abort_ba = True
            self._cv.notify()
        self._thread.join(timeout)

    # ---------------- worker loop ---------------------------------------- #
    def _run(self) -> None:
        while True:
            with self._cv:
                while not self._queue and not self._finishing and not self._stop_requested:
                    self._idle.set()
                    self._cv.wait()
                if self._finishing:
                    self._idle.set()
                    return
                if self._stop_requested:
                    self._stopped.set()
                    self._cv.wait()  # woken by release() (or shutdown)
                    continue
                kf, bootstrap = self._queue.popleft()
                self._idle.clear()
            try:
                self.mapper.abort_ba = False
                if self.on_process is not None:
                    self.on_process(kf)
                self.mapper.process(kf, bootstrap=bootstrap)
                if self.on_pass_done is not None:
                    self.on_pass_done(kf)
                if self.loop_worker is not None and not bootstrap:
                    self.loop_worker.insert_keyframe(kf)
            except Exception:  # noqa: BLE001 — a worker crash must surface
                import traceback

                traceback.print_exc()
            finally:
                with self._cv:
                    if not self._queue:
                        self._idle.set()


class LoopWorker:
    """LoopClosing thread: consumes keyframes already processed by local
    mapping and attempts loop detection/closure on each."""

    def __init__(self, process, lock):
        self.process = process  # callback(kf) -> bool (closed a loop)
        self.lock = lock
        self._queue: deque = deque()
        self._cv = threading.Condition()
        self._finishing = False
        self._idle = threading.Event()
        self._idle.set()
        self._thread = threading.Thread(
            target=self._run, daemon=True, name="LoopClosing"
        )
        self._thread.start()

    def insert_keyframe(self, kf: int) -> None:
        with self._cv:
            self._queue.append(kf)
            self._idle.clear()
            self._cv.notify()

    def request_reset(self) -> None:
        with self._cv:
            self._queue.clear()

    def wait_idle(self, timeout: float | None = None) -> bool:
        return self._idle.wait(timeout)

    def shutdown(self, timeout: float = 30.0) -> None:
        with self._cv:
            self._finishing = True
            self._cv.notify()
        self._thread.join(timeout)

    def _run(self) -> None:
        while True:
            with self._cv:
                while not self._queue and not self._finishing:
                    self._idle.set()
                    self._cv.wait()
                if self._finishing:
                    self._idle.set()
                    return
                kf = self._queue.popleft()
                self._idle.clear()
            try:
                self.process(kf)
            except Exception:  # noqa: BLE001
                import traceback

                traceback.print_exc()
            finally:
                with self._cv:
                    if not self._queue:
                        self._idle.set()
