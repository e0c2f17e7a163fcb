"""Async online driver: overlap ingest with pipeline processing.

The reference's online mode runs ingest (ROS spinner) and processing (worker
threads) concurrently (``OnlineRangeDataProcessorRos.cpp:24-41``,
``SlamWrapper::startWorkers``).  Here a single worker thread drains the
wrapper's buffers while the caller's thread ingests scans — same
producer/consumer split, minus the reference's cross-thread result
nondeterminism (stages still run in pipeline order inside the worker).

Use for live sensors; offline replay should call ``process_scan`` directly
(deterministic, and the device is saturated anyway).
"""
from __future__ import annotations

import threading
import time
from typing import Optional

import numpy as np

from open3d_slam_tpu.models.slam_wrapper import SlamWrapper


class AsyncSlamDriver:
    def __init__(self, slam: SlamWrapper, poll_sleep_sec: float = 0.001):
        self.slam = slam
        self.poll_sleep_sec = poll_sleep_sec
        self._worker: Optional[threading.Thread] = None
        self._running = False
        self._error: Optional[BaseException] = None

    # ------------------------------------------------------------------

    def start_workers(self):
        """``startWorkers`` analog (``SlamWrapper.cpp:227-236``)."""
        if self._running:
            return
        self._running = True
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="slam-pipeline")
        self._worker.start()

    def _run(self):
        try:
            while self._running:
                did_odo = self.slam._odometry_step()
                did_map = self.slam._mapping_step()
                if not (did_odo or did_map):
                    time.sleep(self.poll_sleep_sec)
        except BaseException as e:  # surfaced on stop()
            self._error = e

    def add_range_scan(self, points: np.ndarray, timestamp: float) -> bool:
        """Non-blocking ingest; drops when out of order (reference ingest
        semantics).  Backpressure: caller can poll ``is_backpressured``."""
        if self._error:
            raise RuntimeError("pipeline worker died") from self._error
        return self.slam.add_range_scan(points, timestamp)

    def is_backpressured(self) -> bool:
        # Reference semantics: block while EITHER buffer is full
        # (RosbagRangeDataProcessorRos.cpp:69-84).
        return (self.slam.is_odometry_buffer_full() or
                self.slam.is_mapping_buffer_full())

    def stop_workers(self, finish: bool = True):
        """``stopWorkers`` + optional ``finishProcessing``."""
        self._running = False
        if self._worker is not None:
            self._worker.join(timeout=60.0)
            self._worker = None
        if self._error:
            raise RuntimeError("pipeline worker died") from self._error
        if finish:
            self.slam.finish_processing()

    def __enter__(self):
        self.start_workers()
        return self

    def __exit__(self, *exc):
        self.stop_workers(finish=exc[0] is None)
