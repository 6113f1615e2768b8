"""Osmap-format map persistence: save/load the map store in the reference's
checkpoint format (Osmap.cpp:68-291: a YAML header + `.mappoints` /
`.keyframes` / `.features` protobuf files), then rebuild all derived state
on load (the reference's Osmap::rebuild, Osmap.cpp:507-660).

Wire-compatible with os1: the schema (osmap.proto here) matches the
reference's descriptor, the YAML header is written with OpenCV FileStorage
keys (mappointsFile / nMappoints / keyframesFile / nKeyframes /
featuresFile / nFeatures / Options / cameraMatrices), poses are the first
12 floats of Tcw, and the features file supports both the single-array and
the varint-delimited layout (Osmap.cpp:356-434).
"""
from __future__ import annotations

import os

import numpy as np

from . import osmap_pb2 as pb

# Option bits (reference Osmap.h:189-213).
NO_LOOPS = 1 << 0
NO_FEATURES_DESCRIPTORS = 1 << 1
K_IN_KEYFRAME = 1 << 2
ONLY_MAPPOINTS_FEATURES = 1 << 3
FEATURES_FILE_DELIMITED = 1 << 4
FEATURES_FILE_NOT_DELIMITED = 1 << 5

FEATURES_MESSAGE_LIMIT = 1_000_000


def _write_varint(f, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        f.write(bytes([b | (0x80 if n else 0)]))
        if not n:
            break


def _read_varint(data: bytes, pos: int):
    shift = 0
    out = 0
    while True:
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def save_map(store, cfg, base: str, options: int = 0) -> dict:
    """Serialize the live map to ``base``.yaml/.mappoints/.keyframes/.features.
    Returns the header dict. Invalid (masked) slots are skipped — the
    equivalent of the reference's pre-save depuration (Osmap.cpp:481-505)."""
    if base.endswith(".yaml"):
        base = base[:-5]
    header: dict = {"Options": options}

    # --- mappoints ---
    pts = np.nonzero(store.pt_valid)[0]
    arr = pb.SerializedMappointArray()
    for p in pts:
        m = arr.mappoint.add()
        m.id = int(p)
        m.position.x, m.position.y, m.position.z = map(float, store.pt_xyz[p])
        m.visible = float(store.pt_visible[p])
        m.found = float(store.pt_found[p])
        m.briefdescriptor.block.extend(int(x) for x in store.pt_desc[p])
    with open(base + ".mappoints", "wb") as f:
        f.write(arr.SerializeToString())
    header["mappointsFile"] = base + ".mappoints"
    header["nMappoints"] = len(pts)

    # --- keyframes ---
    kfs = np.nonzero(store.kf_valid)[0]
    karr = pb.SerializedKeyframeArray()
    for k in kfs:
        m = karr.keyframe.add()
        m.id = int(k)
        m.pose.element.extend(float(x) for x in store.kf_T[k][:3].reshape(-1))
        m.kindex = 0
        m.timestamp = float(store.kf_timestamp[k])
    with open(base + ".keyframes", "wb") as f:
        f.write(karr.SerializeToString())
    header["keyframesFile"] = base + ".keyframes"
    header["nKeyframes"] = len(kfs)

    # --- features ---
    n_features = 0
    farr = pb.SerializedKeyframeFeaturesArray()
    only_mp = bool(options & ONLY_MAPPOINTS_FEATURES)
    no_desc = bool(options & NO_FEATURES_DESCRIPTORS)
    for k in kfs:
        kf_msg = farr.feature.add()
        kf_msg.keyframe_id = int(k)
        fv = store.kf_feat_valid[k]
        for f_idx in np.nonzero(fv)[0]:
            pid = int(store.kf_obs_point[k, f_idx])
            if only_mp and pid < 0:
                continue
            feat = kf_msg.feature.add()
            if pid >= 0:
                feat.mappoint_id = pid + 1  # 0 = "no mappoint" on the wire
            feat.keypoint.ptx = float(store.kf_xy[k, f_idx, 0])
            feat.keypoint.pty = float(store.kf_xy[k, f_idx, 1])
            feat.keypoint.angle = float(store.kf_angle[k, f_idx])
            feat.keypoint.octave = float(store.kf_octave[k, f_idx])
            if not no_desc:
                feat.briefdescriptor.block.extend(
                    int(x) for x in store.kf_desc[k, f_idx]
                )
            n_features += 1
    delimited = bool(options & FEATURES_FILE_DELIMITED) or (
        not options & FEATURES_FILE_NOT_DELIMITED
        and n_features > FEATURES_MESSAGE_LIMIT
    )
    with open(base + ".features", "wb") as f:
        if delimited:
            for kf_msg in farr.feature:
                single = pb.SerializedKeyframeFeaturesArray()
                single.feature.add().CopyFrom(kf_msg)
                data = single.SerializeToString()
                _write_varint(f, len(data))
                f.write(data)
        else:
            f.write(farr.SerializeToString())
    header["featuresFile"] = base + ".features"
    header["nFeatures"] = n_features

    header["cameraMatrices"] = [
        {
            "fx": float(cfg.intr[0]),
            "fy": float(cfg.intr[1]),
            "cx": float(cfg.intr[2]),
            "cy": float(cfg.intr[3]),
        }
    ]
    header["loopEdges"] = []

    _write_yaml_header(base + ".yaml", header)
    return header


def _write_yaml_header(path: str, header: dict) -> None:
    """OpenCV FileStorage YAML (the reference reads/writes through
    cv::FileStorage); falls back to plain YAML if cv2 is unavailable."""
    try:
        import cv2

        fs = cv2.FileStorage(path, cv2.FILE_STORAGE_WRITE)
        for key in ("mappointsFile", "keyframesFile", "featuresFile"):
            if key in header:
                fs.write(key, header[key])
        for key in ("nMappoints", "nKeyframes", "nFeatures", "Options"):
            if key in header:
                fs.write(key, int(header[key]))
        fs.startWriteStruct("cameraMatrices", cv2.FILE_NODE_SEQ)
        for kmat in header["cameraMatrices"]:
            fs.startWriteStruct("", cv2.FILE_NODE_MAP | cv2.FILE_NODE_FLOW)
            for kk in ("fx", "fy", "cx", "cy"):
                fs.write(kk, float(kmat[kk]))
            fs.endWriteStruct()
        fs.endWriteStruct()
        fs.release()
    except ImportError:
        import yaml

        with open(path, "w") as f:
            yaml.safe_dump(header, f)


def _read_yaml_header(path: str) -> dict:
    try:
        import cv2

        fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
        out = {}
        for key in ("mappointsFile", "keyframesFile", "featuresFile"):
            node = fs.getNode(key)
            if not node.empty():
                out[key] = node.string()
        for key in ("nMappoints", "nKeyframes", "nFeatures", "Options"):
            node = fs.getNode(key)
            if not node.empty():
                out[key] = int(node.real())
        kms = fs.getNode("cameraMatrices")
        mats = []
        if not kms.empty():
            for i in range(kms.size()):
                n = kms.at(i)
                mats.append({k: n.getNode(k).real() for k in ("fx", "fy", "cx", "cy")})
        out["cameraMatrices"] = mats
        fs.release()
        return out
    except ImportError:
        import yaml

        return yaml.safe_load(open(path))


def load_map(store, cfg, base: str) -> dict:
    """Load a map saved by :func:`save_map` (or by the reference) into a
    cleared store, then rebuild derived state. Returns the header dict."""
    if base.endswith(".yaml"):
        base = base[:-5]
    header = _read_yaml_header(base + ".yaml")
    store.__post_init__()  # clear

    # --- keyframes ---
    karr = pb.SerializedKeyframeArray()
    with open(header.get("keyframesFile", base + ".keyframes"), "rb") as f:
        karr.ParseFromString(f.read())
    for m in karr.keyframe:
        k = int(m.id)
        T = np.eye(4, dtype=np.float32)
        T[:3] = np.array(m.pose.element, np.float32).reshape(3, 4)
        store.kf_valid[k] = True
        store.kf_T[k] = T
        store.kf_timestamp[k] = m.timestamp
        # Saved ids are age-ordered within the saving session; seed the age
        # bookkeeping (spanning-tree/gauge/cull comparisons) from them. The
        # wire format has no frame ids (reference SerializedKeyframe,
        # osmap.proto), so the slot id is the best age proxy on load.
        store.kf_frame_id[k] = k
        store.kf_seq[k] = k
    if len(karr.keyframe):
        store._kf_seq_next = max(int(m.id) for m in karr.keyframe) + 1

    # --- mappoints ---
    parr = pb.SerializedMappointArray()
    with open(header.get("mappointsFile", base + ".mappoints"), "rb") as f:
        parr.ParseFromString(f.read())
    for m in parr.mappoint:
        p = int(m.id)
        store.pt_valid[p] = True
        # Loaded points are mature: never "recent" for the found/visible cull.
        store.pt_first_seq[p] = -(10**9)
        store.pt_xyz[p] = [m.position.x, m.position.y, m.position.z]
        store.pt_visible[p] = int(m.visible)
        store.pt_found[p] = int(m.found)
        if len(m.briefdescriptor.block) == 8:
            store.pt_desc[p] = np.array(m.briefdescriptor.block, np.uint32)

    # --- features (both layouts) ---
    raw = open(header.get("featuresFile", base + ".features"), "rb").read()
    farr = pb.SerializedKeyframeFeaturesArray()
    try:
        farr.ParseFromString(raw)
        ok = all(kf.keyframe_id < store.cfg.max_keyframes for kf in farr.feature)
    except Exception:
        ok = False
    if not ok or (len(farr.feature) == 0 and raw):
        farr = pb.SerializedKeyframeFeaturesArray()
        pos = 0
        while pos < len(raw):
            ln, pos = _read_varint(raw, pos)
            chunk = pb.SerializedKeyframeFeaturesArray()
            chunk.ParseFromString(raw[pos : pos + ln])
            pos += ln
            for kf in chunk.feature:
                farr.feature.add().CopyFrom(kf)

    for kf_msg in farr.feature:
        k = int(kf_msg.keyframe_id)
        for i, feat in enumerate(kf_msg.feature):
            if i >= store.cfg.n_features:
                break
            store.kf_feat_valid[k, i] = True
            store.kf_xy[k, i] = [feat.keypoint.ptx, feat.keypoint.pty]
            store.kf_angle[k, i] = feat.keypoint.angle
            store.kf_octave[k, i] = int(feat.keypoint.octave)
            if len(feat.briefdescriptor.block) == 8:
                store.kf_desc[k, i] = np.array(feat.briefdescriptor.block, np.uint32)
            pid = int(feat.mappoint_id) - 1
            if pid >= 0 and store.pt_valid[pid]:
                store.add_observation(pid, k, i)

    rebuild(store, cfg)
    return header


def merge_map(store, cfg, base: str):
    """Load another session's Osmap into the FREE slots of a live store,
    id-remapped (the multi-session substrate: the reference's mapLoad
    replaces the map, Osmap.cpp:180-291; merging two sessions needs both
    resident). Geometry stays in the loaded session's own world frame —
    the caller aligns and fuses (System.merge_session).

    Returns (kf_map, pt_map): old-id -> new-slot arrays (-1 = dropped)."""
    if base.endswith(".yaml"):
        base = base[:-5]
    header = _read_yaml_header(base + ".yaml")

    karr = pb.SerializedKeyframeArray()
    with open(header.get("keyframesFile", base + ".keyframes"), "rb") as f:
        karr.ParseFromString(f.read())
    kf_map = np.full(store.cfg.max_keyframes, -1, np.int64)
    # Age-ordered insertion (saved ids are age-ordered in their session):
    # merged keyframes continue this store's monotonic seq after the
    # resident ones.
    fid_base = int(store.kf_frame_id[store.kf_valid].max(initial=-1)) + 1
    for m in sorted(karr.keyframe, key=lambda m: int(m.id)):
        old = int(m.id)
        k = store.add_keyframe_pending(
            np.vstack([
                np.array(m.pose.element, np.float32).reshape(3, 4),
                [0, 0, 0, 1],
            ]),
            frame_id=fid_base + old,
            timestamp=float(m.timestamp),
        )
        kf_map[old] = k

    parr = pb.SerializedMappointArray()
    with open(header.get("mappointsFile", base + ".mappoints"), "rb") as f:
        parr.ParseFromString(f.read())
    pt_map = np.full(store.cfg.max_points, -1, np.int64)
    ids = store.alloc_points(len(parr.mappoint))
    # Merged points are mature by definition (they survived their session's
    # culling): a sentinel far in the past keeps the recent-point cull from
    # ever classifying them as freshly created.
    store.pt_first_seq[ids] = -(10**9)
    for p, m in zip(ids, parr.mappoint):
        old = int(m.id)
        pt_map[old] = p
        store.pt_xyz[p] = [m.position.x, m.position.y, m.position.z]
        store.pt_visible[p] = int(m.visible)
        store.pt_found[p] = int(m.found)
        if len(m.briefdescriptor.block) == 8:
            store.pt_desc[p] = np.array(m.briefdescriptor.block, np.uint32)

    raw = open(header.get("featuresFile", base + ".features"), "rb").read()
    farr = pb.SerializedKeyframeFeaturesArray()
    try:
        farr.ParseFromString(raw)
        ok = all(kf.keyframe_id < store.cfg.max_keyframes for kf in farr.feature)
    except Exception:
        ok = False
    if not ok or (len(farr.feature) == 0 and raw):
        farr = pb.SerializedKeyframeFeaturesArray()
        pos = 0
        while pos < len(raw):
            ln, pos = _read_varint(raw, pos)
            chunk = pb.SerializedKeyframeFeaturesArray()
            chunk.ParseFromString(raw[pos : pos + ln])
            pos += ln
            for kf in chunk.feature:
                farr.feature.add().CopyFrom(kf)
    for kf_msg in farr.feature:
        k = int(kf_map[int(kf_msg.keyframe_id)])
        if k < 0:
            continue
        for i, feat in enumerate(kf_msg.feature):
            if i >= store.cfg.n_features:
                break
            store.kf_feat_valid[k, i] = True
            store.kf_xy[k, i] = [feat.keypoint.ptx, feat.keypoint.pty]
            store.kf_angle[k, i] = feat.keypoint.angle
            store.kf_octave[k, i] = int(feat.keypoint.octave)
            if len(feat.briefdescriptor.block) == 8:
                store.kf_desc[k, i] = np.array(feat.briefdescriptor.block, np.uint32)
            pid_old = int(feat.mappoint_id) - 1
            if pid_old >= 0 and pt_map[pid_old] >= 0:
                store.add_observation(int(pt_map[pid_old]), k, i)

    # Cull merged points that arrived with no observations; refresh derived
    # state for the rest (normals/scale/distinctive descriptor).
    merged_pts = pt_map[pt_map >= 0]
    orphans = merged_pts[store.pt_n_obs[merged_pts] == 0]
    if len(orphans):
        store.cull_points(orphans)
    merged_pts = merged_pts[store.pt_valid[merged_pts]]
    store.update_point_derived(merged_pts, cfg.orb.scale_factor, cfg.orb.n_levels)
    return kf_map, pt_map


def rebuild(store, cfg) -> None:
    """Recompute all derived state after load (Osmap::rebuild,
    Osmap.cpp:507-660): normals, scale bands, distinctive descriptors;
    points left with no observations are culled; covisibility is on-demand
    in this design so nothing else persists."""
    pts = np.nonzero(store.pt_valid)[0]
    orphans = pts[store.pt_n_obs[pts] == 0]
    if len(orphans):
        store.cull_points(orphans)
    pts = np.nonzero(store.pt_valid)[0]
    store.update_point_derived(pts, cfg.orb.scale_factor, cfg.orb.n_levels)
