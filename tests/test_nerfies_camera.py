"""Nerfies distortion camera (data/nerfies_camera.py) vs reference semantics
(scene/utils.py:28-330): undistort inverts distort, project/ray round-trips,
pinhole degeneration, image undistortion."""

import numpy as np
import pytest

from ed3dgs_tpu.data.nerfies_camera import (NerfiesCamera, distort,
                                            undistort)

K = dict(k1=-0.28, k2=0.07, k3=-0.005, p1=1e-3, p2=-7e-4)


def make_cam(**kw):
    base = dict(
        orientation=np.array([[0.0, -1.0, 0.0],
                              [1.0, 0.0, 0.0],
                              [0.0, 0.0, 1.0]]),
        position=np.array([0.2, -0.1, -1.5]),
        focal_length=420.0,
        principal_point=np.array([318.5, 242.0]),
        image_size=np.array([640, 480]),
        radial_distortion=np.array([K["k1"], K["k2"], K["k3"]]),
        tangential_distortion=np.array([K["p1"], K["p2"]]),
    )
    base.update(kw)
    return NerfiesCamera(**base)


def test_undistort_inverts_distort():
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.4, 0.4, 500)
    y = rng.uniform(-0.3, 0.3, 500)
    xd, yd = distort(x, y, **K)
    xu, yu = undistort(xd, yd, **K)
    np.testing.assert_allclose(xu, x, atol=1e-9)
    np.testing.assert_allclose(yu, y, atol=1e-9)


def test_project_ray_roundtrip():
    """world point -> distorted pixel -> undistorted ray hits the point."""
    cam = make_cam()
    rng = np.random.default_rng(1)
    pts = cam.position + np.stack([rng.uniform(-0.5, 0.5, 40),
                                   rng.uniform(-0.4, 0.4, 40),
                                   rng.uniform(1.5, 4.0, 40)], 1) \
        @ np.linalg.inv(cam.orientation).T
    pix = cam.project(pts)
    rays = cam.pixels_to_rays(pix)
    want = pts - cam.position
    want /= np.linalg.norm(want, axis=-1, keepdims=True)
    np.testing.assert_allclose(rays, want, atol=1e-7)
    # unprojection at the optical-axis depth recovers the points
    depth = (pts - cam.position) @ cam.orientation[2]
    back = cam.pixels_to_points(pix, depth)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_pinhole_degeneration():
    """Zero distortion: rays match the closed-form pinhole directions."""
    cam = make_cam(radial_distortion=np.zeros(3),
                   tangential_distortion=np.zeros(2))
    assert not cam.has_distortion
    pix = np.array([[100.0, 50.0], [318.5, 242.0], [600.0, 400.0]])
    rays = cam.pixel_to_local_rays(pix)
    x = (pix[:, 0] - 318.5) / 420.0
    y = (pix[:, 1] - 242.0) / 420.0
    d = np.stack([x, y, np.ones(3)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    np.testing.assert_allclose(rays, d, atol=1e-12)


def test_from_json_and_scale():
    cj = {"orientation": np.eye(3).tolist(), "position": [0, 0, 0],
          "focal_length": 100.0, "principal_point": [32, 24],
          "image_size": [64, 48], "skew": 0.0, "pixel_aspect_ratio": 1.0,
          "radial_distortion": [-0.1, 0.01, 0.0],
          "tangential": [1e-3, 0.0]}    # old schema key
    cam = NerfiesCamera.from_json_dict(cj)
    assert cam.tangential_distortion[0] == pytest.approx(1e-3)
    half = cam.scale(0.5)
    assert half.focal_length == 50.0
    assert tuple(half.image_size) == (32, 24)
    np.testing.assert_allclose(half.radial_distortion, cam.radial_distortion)


def test_undistort_image_identity_without_distortion():
    cam = make_cam(radial_distortion=np.zeros(3),
                   tangential_distortion=np.zeros(2),
                   image_size=np.array([32, 24]),
                   principal_point=np.array([16.0, 12.0]),
                   focal_length=30.0)
    rng = np.random.default_rng(2)
    img = rng.random((24, 32, 3)).astype(np.float32)
    out = cam.undistort_image(img)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_undistort_image_moves_borders():
    cam = make_cam(image_size=np.array([64, 48]),
                   principal_point=np.array([32.0, 24.0]),
                   focal_length=40.0)
    img = np.zeros((48, 64, 1), np.float32)
    img[:, 30:34] = 1.0            # vertical stripe through the center
    out = cam.undistort_image(img)
    # center row barely moves; corners resample from elsewhere
    assert out[24, 32, 0] > 0.9
    assert not np.allclose(out, img)
