"""Video-trajectory generators: spiral (DyNeRF), circular orbit (NerSemble),
slerp-smoothed path (HyperNeRF). Parity targets cited in
ed3dgs_tpu/data/trajectories.py."""

import math

import numpy as np
import pytest

from ed3dgs_tpu.core.camera_math import world_to_view
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.data.trajectories import (
    circle_around_axis, get_spiral, nersemble_video_cameras, quaternion_slerp,
    smooth_camera_poses, spiral_video_cameras, _quat_to_rot, _rot_to_quat)


def _ring_cameras(n=8, radius=3.0):
    cams = []
    for i in range(n):
        a = 2 * math.pi * i / n
        eye = np.array([radius * math.cos(a), 0.3 * math.sin(a), radius * math.sin(a)])
        cams.append(look_at_camera(eye, [0, 0, 0], [0, 1, 0], 0.8, 0.6, 64, 48,
                                   cam_no=i))
    return cams


def _c2w(cam):
    return np.linalg.inv(world_to_view(cam.R, cam.T))


def test_spiral_poses_shape_and_orthonormal():
    cams = _ring_cameras()
    c2ws = np.stack([_c2w(c) for c in cams])
    poses = get_spiral(c2ws, 0.01, 100.0, n_views=60)
    assert poses.shape == (60, 4, 4)
    for p in poses:
        R = p[:3, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-8)


def test_spiral_video_cameras_contract():
    cams = _ring_cameras()
    video = spiral_video_cameras(cams, n_views=30)
    assert len(video) == 30
    assert video[0].time == 0.0 and video[-1].time == 1.0
    assert video[0].width == cams[0].width
    # spiral stays within a few radii of the base camera
    base = _c2w(cams[0])[:3, 3]
    for v in video:
        assert np.linalg.norm(_c2w(v)[:3, 3] - base) < 10.0
        # matrices() must work (renderable without images)
        m = v.matrices()
        assert np.isfinite(m.full_proj).all()


def test_circle_around_axis_geometry():
    n = 16
    axis, move = np.array([0.0, 0.0, 1.0]), np.array([1.0, 2.0, 3.0])
    look_at = move + 1.1 * axis
    poses = circle_around_axis(n, axis, (0, -1, 0), move, look_at, distance=0.5)
    assert len(poses) == n
    for p in poses:
        eye = p[:3, 3]
        # on the circle: distance 0.5 from center, in the perpendicular plane
        assert abs(np.linalg.norm(eye - move) - 0.5) < 1e-9
        assert abs(np.dot(eye - move, axis)) < 1e-9
        # looks at the target: forward (z) points from eye to look_at
        fwd = p[:3, 2]
        np.testing.assert_allclose(fwd, (look_at - eye) / np.linalg.norm(look_at - eye),
                                   atol=1e-9)
        R = p[:3, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-9)
        assert np.linalg.det(R) > 0


def test_nersemble_video_cameras():
    cams = _ring_cameras()
    video = nersemble_video_cameras(cams, duration=24)
    assert len(video) == 24
    assert video[0].time == 0.0
    assert abs(video[-1].time - 1.0) < 1e-12
    centers = np.stack([_c2w(v)[:3, 3] for v in video])
    centroid_in = np.stack([_c2w(c)[:3, 3] for c in cams]).mean(axis=0)
    d = np.linalg.norm(centers - centroid_in, axis=1)
    np.testing.assert_allclose(d, 0.5, atol=1e-9)  # orbit radius (reference :619)


def test_quaternion_slerp_halfway():
    q0 = _rot_to_quat(np.eye(3))
    Rz90 = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
    q1 = _rot_to_quat(Rz90)
    mid = _quat_to_rot(quaternion_slerp(q0, q1, 0.5))
    ang = math.degrees(math.atan2(mid[1, 0], mid[0, 0]))
    assert abs(ang - 45.0) < 1e-6


def test_rot_quat_roundtrip_random():
    rng = np.random.default_rng(0)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = _quat_to_rot(q)
        q2 = _rot_to_quat(R)
        # q and -q are the same rotation
        assert min(np.linalg.norm(q2 - q), np.linalg.norm(q2 + q)) < 1e-9


def test_smooth_camera_poses_counts_and_endpoints():
    cams = _ring_cameras(n=5)
    out = smooth_camera_poses(cams, num_interpolations=3)
    assert len(out) == (5 - 1) * (3 + 1) + 1
    # endpoints coincide with the input cameras
    np.testing.assert_allclose(_c2w(out[0]), _c2w(cams[0]), atol=1e-6)
    np.testing.assert_allclose(_c2w(out[-1]), _c2w(cams[-1]), atol=1e-6)
    assert out[0].time == 0.0 and out[-1].time == 1.0
    # cap (reference hyper_loader.py:127 caps at 500)
    capped = smooth_camera_poses(cams, num_interpolations=3, max_poses=7)
    assert len(capped) == 7 and capped[-1].time == 1.0


def test_hyper_and_colmap_video_wiring():
    # readers expose the video trajectory through SceneInfo.video_cameras;
    # exercised indirectly: spiral/circle generators accept frame-0 camera
    # lists with duplicated cam_no entries filtered upstream.
    cams = _ring_cameras()
    assert len(spiral_video_cameras(cams, n_views=5)) == 5
    assert len(nersemble_video_cameras(cams, duration=5)) == 5
