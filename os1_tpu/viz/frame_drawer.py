"""Frame overlay rendering: the reference FrameDrawer's HUD
(FrameDrawer.cc:52-216) — per-keypoint health-colored markers, tracking
state, and the status bar (state, KFs, MPs, matches), with the os1
tracking-health background tint (greenness proportional to match count,
FrameDrawer.cc:181).
"""
from __future__ import annotations

import numpy as np


def draw_frame(
    img: np.ndarray,
    xy: np.ndarray,
    bound: np.ndarray,
    valid: np.ndarray,
    state_name: str = "OK",
    n_kfs: int = 0,
    n_pts: int = 0,
    n_matches: int = 0,
) -> np.ndarray:
    """Compose the tracking overlay. Returns a BGR uint8 image."""
    import cv2

    g = np.clip(img, 0, 255).astype(np.uint8)
    out = cv2.cvtColor(g, cv2.COLOR_GRAY2BGR)

    # Health tint: greener = more matches (os1 FrameDrawer.cc:181).
    health = min(n_matches / 150.0, 1.0)
    tint = np.zeros_like(out)
    tint[:, :, 1] = int(60 * health)
    out = cv2.addWeighted(out, 1.0, tint, 0.5, 0)

    for i in range(len(xy)):
        if not valid[i]:
            continue
        p = (int(xy[i, 0]), int(xy[i, 1]))
        if bound[i]:
            cv2.circle(out, p, 3, (0, 255, 0), 1)  # tracked map point
        else:
            cv2.circle(out, p, 1, (180, 120, 0), 1)  # unmatched feature

    bar = np.zeros((22, out.shape[1], 3), np.uint8)
    text = (
        f"{state_name}  KFs: {n_kfs}  MPs: {n_pts}  Matches: {n_matches}"
    )
    cv2.putText(bar, text, (6, 15), cv2.FONT_HERSHEY_PLAIN, 1.0,
                (255, 255, 255), 1)
    return np.concatenate([out, bar], axis=0)
