"""Viewer: live window and/or periodic snapshots of the frame overlay + 3D
map (the reference Viewer thread, Viewer.cc:77-473, minus Pangolin).

Interactive keys (when a display is available) mirror the reference
(Viewer.cc:171-249): space = pause, r = reset, g = save map, q/ESC = quit.
Headless mode writes PNG snapshots instead.
"""
from __future__ import annotations

import os

import numpy as np

from .frame_drawer import draw_frame
from .map_drawer import draw_map


class Viewer:
    def __init__(self, system, live: bool = False,
                 snapshot_dir: str | None = None, snapshot_every: int = 30):
        self.system = system
        self.live = live
        self.snapshot_dir = snapshot_dir
        self.snapshot_every = snapshot_every
        self.frame_count = 0
        self.quit_requested = False
        self.pause_requested = False
        if snapshot_dir:
            os.makedirs(snapshot_dir, exist_ok=True)

    def update(self, img: np.ndarray, state, Tcw) -> None:
        self.frame_count += 1
        want_snapshot = (
            self.snapshot_dir is not None
            and self.frame_count % self.snapshot_every == 0
        )
        if not (self.live or want_snapshot):
            return

        tr = self.system.tracker
        st = self.system.store
        if tr.last is not None:
            xy = np.asarray(tr.last.data.feats.xy)
            valid = np.asarray(tr.last.data.feats.valid)
            bound = tr.last.bind >= 0
            n_matches = int(bound.sum())
        else:
            xy = np.zeros((0, 2))
            valid = np.zeros(0, bool)
            bound = np.zeros(0, bool)
            n_matches = 0
        frame_img = draw_frame(
            img, xy, bound, valid, state.name,
            st.n_keyframes(), st.n_points(), n_matches,
        )
        map_img = draw_map(st, Tcw)

        if want_snapshot:
            import cv2

            cv2.imwrite(
                os.path.join(self.snapshot_dir, f"frame_{self.frame_count:06d}.png"),
                frame_img,
            )
            cv2.imwrite(
                os.path.join(self.snapshot_dir, f"map_{self.frame_count:06d}.png"),
                map_img,
            )
        if self.live:
            import cv2

            cv2.imshow("os1-tpu: frame", frame_img)
            cv2.imshow("os1-tpu: map", map_img)
            key = cv2.waitKey(1) & 0xFF
            if key in (ord("q"), 27):
                self.quit_requested = True
            elif key == ord(" "):
                self.pause_requested = not self.pause_requested
            elif key == ord("r"):
                self.system.reset()
            elif key == ord("g"):
                self.system.save_map("viewer_saved_map")

    def close(self):
        if self.live:
            import cv2

            cv2.destroyAllWindows()
