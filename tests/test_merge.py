"""Multi-session map merging (BASELINE config 5): two SLAM sessions over
overlapping halves of one scene are saved as Osmap checkpoints; a fresh
system loads one and merges the other — the merged map must contain both
sessions' keyframes, aligned into one world frame via BoW + Sim3, with the
joint keyframe trajectory accurate against ground truth."""
import numpy as np
import pytest

from os1_tpu.io import synthetic

from test_pipeline import H, K, W, make_system


@pytest.fixture(scope="module")
def two_sessions(tmp_path_factory):
    """Run two overlapping sync sessions around the room circuit and save
    both maps. Session A covers the first ~60%, session B the last ~60% —
    a ~20% overlap region for cross-session place recognition."""
    scene = synthetic.room_scene(seed=5)
    poses = synthetic.loop_trajectory(150, radius=1.5, revolutions=0.9)
    frames = [synthetic.render(scene, T, K, H, W) for T in poses]
    tmp = tmp_path_factory.mktemp("merge")
    bases = []
    spans = [(0, 90), (60, 150)]
    for si, (lo, hi) in enumerate(spans):
        sys_ = make_system()
        for i in range(lo, hi):
            sys_.track_monocular(frames[i], timestamp=i / 30.0)
        sys_.flush()
        assert sys_.store.n_keyframes() >= 4, f"session {si} built no map"
        base = str(tmp / f"session{si}")
        sys_.save_map(base)
        bases.append(base)
        sys_.shutdown()
    return bases, poses, spans


def test_merge_two_sessions(two_sessions):
    bases, poses, spans = two_sessions
    sys_ = make_system()
    sys_.load_map(bases[0])
    n_a = sys_.store.n_keyframes()
    ok = sys_.merge_session(bases[1])
    assert ok, "cross-session alignment not found"
    st = sys_.store
    assert st.n_keyframes() > n_a, "merge added no keyframes"
    assert np.isfinite(st.kf_T[st.kf_valid]).all()
    assert np.isfinite(st.pt_xyz[st.pt_valid]).all()

    # Joint keyframe trajectory vs ground truth: the merged (session-B)
    # keyframes must land on the B segment of the circuit after alignment.
    traj = sys_.keyframe_trajectory()
    est, gt = [], []
    for ts, Twc in traj:
        fid = int(round(ts * 30.0))
        est.append(np.linalg.inv(Twc))
        gt.append(poses[fid])
    ate = synthetic.ate_rmse(est, gt)
    pg = np.array([-T[:3, :3].T @ T[:3, 3] for T in gt])
    traj_len = np.linalg.norm(np.diff(pg, axis=0), axis=1).sum()
    assert ate < 0.05 * traj_len, f"merged-map ATE {ate:.4f} over {traj_len:.2f}"
    # Keyframes from BOTH spans are present in the joint trajectory.
    fids = [int(round(ts * 30.0)) for ts, _ in traj]
    assert min(fids) < spans[0][1] - 30 and max(fids) >= spans[1][0] + 30


def test_merge_rolls_back_without_overlap(two_sessions, tmp_path):
    """A merge with no cross-session overlap must leave the map unchanged."""
    bases, poses, spans = two_sessions
    # Session C: a different scene entirely.
    scene = synthetic.default_scene(seed=11)
    cposes = synthetic.orbit_trajectory(40, advance=0.08)
    sys_c = make_system()
    for i, T in enumerate(cposes):
        sys_c.track_monocular(synthetic.render(scene, T, K, H, W),
                              timestamp=i / 30.0)
    sys_c.flush()
    base_c = str(tmp_path / "sessionC")
    sys_c.save_map(base_c)
    sys_c.shutdown()

    sys_ = make_system()
    sys_.load_map(bases[0])
    n_kf = sys_.store.n_keyframes()
    n_pt = sys_.store.n_points()
    ok = sys_.merge_session(base_c)
    assert not ok, "disjoint sessions must not align"
    assert sys_.store.n_keyframes() == n_kf
    assert sys_.store.n_points() == n_pt
