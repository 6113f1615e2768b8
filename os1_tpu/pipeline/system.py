"""System facade: the public API of the SLAM engine.

Mirrors the reference's System class (System.h:258-459 / System.cc:41-184):
construction wires tracking + local mapping (+ loop closing when enabled),
`track_monocular` is the per-frame entry point, localization-only mode
freezes the map, reset and trajectory export match the reference semantics.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..map.mirror import DeviceMirror
from ..map.store import MapStore
from ..utils.profiling import StageTimer
from .config import SlamConfig
from .local_mapping import LocalMapper
from .tracking import Tracker, TrackingState


@dataclass
class System:
    cfg: SlamConfig
    enable_mapping: bool = True  # False = localization-only mode
    enable_loop_closing: bool = True
    pipelined: bool = False  # 1-frame-lag tracking pipeline (see tracking.py)
    store: MapStore = None
    vocab = None  # Vocabulary | None (None -> packaged default)
    tracker: Tracker = field(init=False)
    mapper: LocalMapper = field(init=False)

    def __post_init__(self):
        if self.store is None:
            self.store = MapStore(self.cfg.map)
        # One shared stage timer across all pipeline components: the
        # observability the reference lacked (SURVEY.md §5 tracing row).
        self.timer = StageTimer()
        self.tracker = Tracker(cfg=self.cfg, store=self.store)
        self.tracker.timer = self.timer
        self.mapper = LocalMapper(cfg=self.cfg, store=self.store, timer=self.timer)
        self.tracker.on_new_keyframe = self._on_new_keyframe
        # Device-resident map mirror: per-frame tracking reads the map from
        # HBM; every map mutation below ends by re-publishing it (the
        # TPU-native Map::mMutexMapUpdate — see map/mirror.py).
        self.mirror = DeviceMirror(self.store)
        self.tracker.mirror = self.mirror
        self.tracker.pipelined = self.pipelined

        # Place recognition: BoW database over the packaged vocabulary
        # (System.cc:100 loads orbVoc.bin; here the default vocabulary, or a
        # DBoW2 binary passed as `vocab`).
        if self.vocab is None:
            from ..vocab.dbow2 import default_vocabulary

            self.vocab = default_vocabulary()
        from ..vocab.database import KeyFrameDatabase
        from .loop_closing import LoopCloser
        from .relocalization import Relocalizer

        self.db = KeyFrameDatabase(self.vocab, self.cfg.map.max_keyframes)
        self.tracker.relocalizer = Relocalizer(
            cfg=self.cfg, store=self.store, db=self.db
        )
        self.loop_closer = LoopCloser(cfg=self.cfg, store=self.store, db=self.db)
        self.mapper.on_cull_keyframe = self.db.erase
        self.tracker.on_reset = self._on_reset
        self._kf_count = 0

    def _on_reset(self):
        self.db.clear()
        self.mirror.refresh()

    def _on_new_keyframe(self, kf: int, bootstrap: bool = False):
        st = self.store
        with self.timer("bow.compute"):
            _, _, bow = self.db.compute_bow(st.kf_desc[kf], st.kf_feat_valid[kf])
            self.db.add(kf, bow)
        self._kf_count += 1
        if self.enable_mapping:
            self.mapper.process(kf, bootstrap=bootstrap)
            if self.enable_loop_closing and not bootstrap:
                with self.timer("loop.process"):
                    self.loop_closer.process(kf, self._kf_count)
        with self.timer("mirror.refresh"):
            self.mirror.refresh()

    # ------------------------------------------------------------------ #
    def track_monocular(self, img, timestamp: float = 0.0):
        """Feed one grayscale (or RGB) image. Returns (state, Tcw | None)
        (System::TrackMonocular, System.cc:115-152)."""
        img = np.asarray(img)
        if img.ndim == 3:
            from ..ops.image import rgb_to_gray
            import jax.numpy as jnp

            img = np.asarray(rgb_to_gray(jnp.asarray(img)))
        return self.tracker.track(img, timestamp)

    def activate_localization_mode(self):
        """Stop mapping; track against the frozen map (System.cc:154-158)."""
        self.enable_mapping = False

    def deactivate_localization_mode(self):
        self.enable_mapping = True

    def reset(self):
        self.tracker.reset()  # on_reset callback clears the BoW database

    def flush(self):
        """Drain the pipelined in-flight frame (end of stream)."""
        self.tracker.flush()

    @property
    def state(self) -> TrackingState:
        return self.tracker.state

    # ------------------------------------------------------------------ #
    def save_map(self, base: str, options: int = 0):
        """Serialize the map in Osmap format (reference Osmap::mapSave,
        Osmap.cpp:68-178; wired to the viewer's save menu in the reference,
        main.cc:147-182)."""
        from ..io import osmap_io

        return osmap_io.save_map(self.store, self.cfg, base, options)

    def load_map(self, base: str):
        """Load an Osmap-format map and resume in LOST state: the next
        frames relocalize into the loaded map (Osmap::mapLoad semantics,
        Osmap.cpp:180-291)."""
        from ..io import osmap_io

        header = osmap_io.load_map(self.store, self.cfg, base)
        # Rebuild the BoW database for relocalization.
        self.db.clear()
        for k in np.nonzero(self.store.kf_valid)[0]:
            _, _, bow = self.db.compute_bow(
                self.store.kf_desc[k], self.store.kf_feat_valid[k]
            )
            self.db.add(int(k), bow)
        self.tracker.state = TrackingState.LOST
        self.tracker.last = None
        self.tracker.velocity = None
        kfs = np.nonzero(self.store.kf_valid)[0]
        self.tracker.ref_kf = int(kfs[-1]) if len(kfs) else -1
        self.mirror.refresh()
        return header

    # ------------------------------------------------------------------ #
    def keyframe_trajectory(self):
        """[(timestamp, Twc 4x4)] for all live keyframes, sorted by time
        (SaveKeyFrameTrajectoryTUM source data, System.h:345-349)."""
        st = self.store
        out = []
        for k in np.nonzero(st.kf_valid)[0]:
            Tcw = st.kf_T[k]
            R = Tcw[:3, :3]
            Twc = np.eye(4, dtype=np.float64)
            Twc[:3, :3] = R.T
            Twc[:3, 3] = -R.T @ Tcw[:3, 3]
            out.append((float(st.kf_timestamp[k]), Twc))
        out.sort(key=lambda x: x[0])
        return out

    def frame_trajectory(self):
        """[(timestamp, frame_id, Tcw)] for every tracked frame."""
        return list(self.tracker.trajectory)

    def save_keyframe_trajectory_tum(self, path: str):
        """TUM format: 'timestamp tx ty tz qx qy qz qw' per keyframe."""
        from ..geometry import se3
        import jax.numpy as jnp

        with open(path, "w") as f:
            for ts, Twc in self.keyframe_trajectory():
                q = np.asarray(se3.to_quaternion(jnp.asarray(Twc[:3, :3])))
                t = Twc[:3, 3]
                f.write(
                    f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
                )
