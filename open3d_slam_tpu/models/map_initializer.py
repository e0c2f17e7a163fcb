"""SlamMapInitializer — localization-mode bootstrap.

Mirror of the reference's ``SlamMapInitializer``
(``ros/open3d_slam_ros/src/SlamMapInitializer.cpp:51-93``):

  * ``initialize``: load/set the initial map + initial transform
    (``:56-64``);
  * interactive initialization window (``initializeWorker``, ``:79-93``):
    while the user is still aligning the pose, scan merging is DISABLED and
    the min-refinement-fitness gate is IGNORED so scan-to-map refinement
    keeps running (and publishing a usable pose) even from a bad alignment;
    on confirmation, merging is restored immediately and the fitness gate
    one processed scan later (the reference uses a 1 s sleep for the same
    "let one refinement land first" hack, ``:89-91``).

The rviz interactive-marker/''/initialpose'' UI is replaced by programmatic
``update_pose`` calls (any host UI can drive it); ``cli/localization.py``'s
``--initial-pose`` / ``--global-init`` supersede the marker workflow for
non-interactive use.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


class SlamMapInitializer:
    def __init__(self, slam):
        self.slam = slam
        self._saved_is_merge: Optional[bool] = None
        self._pending_gate_restore = False

    # -- non-interactive path (SlamMapInitializer::initialize, :56-64) -----

    def initialize(self, map_points: np.ndarray,
                   initial_pose: Optional[np.ndarray] = None):
        self.slam.set_initial_map(map_points)
        if initial_pose is not None:
            self.slam.set_initial_transform(np.asarray(initial_pose))

    # -- interactive window (initializeWorker, :79-93) ---------------------

    def begin_interactive_init(self):
        """Relax the gates while the operator aligns the pose."""
        p = self.slam.params.mapper
        self._saved_is_merge = p.is_merge_scans_into_map
        p.is_merge_scans_into_map = False
        p.is_ignore_min_refinement_fitness = True

    def update_pose(self, T: np.ndarray):
        """Marker-drag / ``/initialpose`` equivalent (``:38-44``)."""
        self.slam.set_initial_transform(np.asarray(T))

    def finish_initialization(self):
        """``initialize_slam`` trigger (``:46-50`` + worker epilogue):
        restore merging now; restore the fitness gate after the next
        processed scan (see ``notify_scan_processed``)."""
        p = self.slam.params.mapper
        if self._saved_is_merge is not None:
            p.is_merge_scans_into_map = self._saved_is_merge
            self._saved_is_merge = None
        self._pending_gate_restore = True

    def notify_scan_processed(self):
        """Call after each processed scan; completes the deferred gate
        restore (the reference's 1 s ``usleep`` hack, ``:89-91``)."""
        if self._pending_gate_restore:
            self.slam.params.mapper.is_ignore_min_refinement_fitness = False
            self._pending_gate_restore = False
            print("Finished setting initial map!")
