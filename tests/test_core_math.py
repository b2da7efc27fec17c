"""Golden tests for core math vs independent (numpy / torch) implementations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ed3dgs_tpu.core import sh as sh_mod
from ed3dgs_tpu.core.quaternion import build_covariance_3d, normalize_quat, quat_to_rotmat, unpack_sym3
from ed3dgs_tpu.core.sym3 import sym3_eigenvalues, sym3_eigenvector, sym3_inverse, sym3_pseudo_inverse_min


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_quat_to_rotmat_orthonormal():
    rng = np.random.default_rng(0)
    q = random_quats(rng, 64)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    assert np.allclose(eye, np.eye(3)[None], atol=1e-5)
    assert np.allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_quat_identity():
    R = np.asarray(quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0])))
    assert np.allclose(R, np.eye(3), atol=1e-7)


def test_covariance_3d_matches_numpy():
    rng = np.random.default_rng(1)
    n = 32
    q = random_quats(rng, n)
    s = np.exp(rng.normal(size=(n, 3)) * 0.3)
    packed = np.asarray(build_covariance_3d(jnp.asarray(s), jnp.asarray(q)))
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    want = np.einsum("nij,nj,nkj->nik", R, s * s, R)
    got = np.asarray(unpack_sym3(jnp.asarray(packed)))
    assert np.allclose(got, want, atol=1e-5)


def test_sym3_eigenvalues_vs_numpy():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(128, 3, 3))
    S = A @ A.transpose(0, 2, 1) + 1e-3 * np.eye(3)
    packed = jnp.asarray(
        np.stack([S[:, 0, 0], S[:, 0, 1], S[:, 0, 2], S[:, 1, 1], S[:, 1, 2], S[:, 2, 2]], axis=-1)
    )
    got = np.sort(np.asarray(sym3_eigenvalues(packed)), axis=-1)
    want = np.sort(np.linalg.eigvalsh(S), axis=-1)
    assert np.allclose(got, want, rtol=1e-4, atol=1e-4 * np.abs(want).max())


def test_sym3_eigenvector():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(64, 3, 3))
    S = A @ A.transpose(0, 2, 1) + 1e-3 * np.eye(3)
    packed = jnp.asarray(
        np.stack([S[:, 0, 0], S[:, 0, 1], S[:, 0, 2], S[:, 1, 1], S[:, 1, 2], S[:, 2, 2]], axis=-1)
    )
    lam = sym3_eigenvalues(packed)[:, 2]
    v = np.asarray(sym3_eigenvector(packed, lam))
    # A v = lam v
    res = np.einsum("nij,nj->ni", S, v) - np.asarray(lam)[:, None] * v
    assert np.abs(res).max() < 1e-2 * np.abs(S).max()


def test_sym3_inverse():
    rng = np.random.default_rng(4)
    A = rng.normal(size=(32, 3, 3))
    S = A @ A.transpose(0, 2, 1) + 0.1 * np.eye(3)
    packed = jnp.asarray(
        np.stack([S[:, 0, 0], S[:, 0, 1], S[:, 0, 2], S[:, 1, 1], S[:, 1, 2], S[:, 2, 2]], axis=-1)
    )
    inv_packed = np.asarray(sym3_inverse(packed))
    got = np.asarray(unpack_sym3(jnp.asarray(inv_packed)))
    want = np.linalg.inv(S)
    assert np.allclose(got, want, rtol=1e-3, atol=1e-4)


def test_sym3_pseudo_inverse_flat_gaussian():
    # near-flat covariance: min scale ~ 0 -> fallback = outer(v_min, v_min)
    q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    s = jnp.array([[1.0, 1.0, 1e-6]])
    packed = build_covariance_3d(s, q)
    inv, well = sym3_pseudo_inverse_min(packed)
    assert not bool(well[0])
    got = np.asarray(unpack_sym3(inv))[0]
    want = np.outer([0, 0, 1.0], [0, 0, 1.0])
    assert np.allclose(np.abs(got), want, atol=1e-3)


def test_sh_matches_torch_reference():
    """Validate against an independent torch implementation of the standard
    real SH basis used by 3DGS (same constants, executed in torch to decouple
    from our jnp code)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    n = 16
    sh = rng.normal(size=(n, 16, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = dirs.astype(np.float32)

    C0, C1 = 0.28209479177387814, 0.4886025119029199
    C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396]
    C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
          0.3731763325901154, -0.4570457994644658, 1.445305721320277,
          -0.5900435899266435]
    tsh = torch.tensor(sh)
    x, y, z = (torch.tensor(dirs[:, i : i + 1]) for i in range(3))
    want = C0 * tsh[:, 0]
    want = want - C1 * y * tsh[:, 1] + C1 * z * tsh[:, 2] - C1 * x * tsh[:, 3]
    xx, yy, zz, xy, yz, xz = x * x, y * y, z * z, x * y, y * z, x * z
    want = (want + C2[0] * xy * tsh[:, 4] + C2[1] * yz * tsh[:, 5]
            + C2[2] * (2 * zz - xx - yy) * tsh[:, 6] + C2[3] * xz * tsh[:, 7]
            + C2[4] * (xx - yy) * tsh[:, 8])
    want = (want + C3[0] * y * (3 * xx - yy) * tsh[:, 9] + C3[1] * xy * z * tsh[:, 10]
            + C3[2] * y * (4 * zz - xx - yy) * tsh[:, 11]
            + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * tsh[:, 12]
            + C3[4] * x * (4 * zz - xx - yy) * tsh[:, 13]
            + C3[5] * z * (xx - yy) * tsh[:, 14]
            + C3[6] * x * (xx - 3 * yy) * tsh[:, 15])

    got = np.asarray(sh_mod.eval_sh(3, jnp.asarray(sh), jnp.asarray(dirs)))
    assert np.allclose(got, want.numpy(), atol=1e-5)


def test_rgb_sh_roundtrip():
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    assert np.allclose(np.asarray(sh_mod.sh_to_rgb_dc(sh_mod.rgb_to_sh(rgb))), np.asarray(rgb), atol=1e-6)


def test_degenerate_gaussian_grads_finite():
    """Regression: a gaussian exactly AT the camera center (zero-padded dead
    slot, camera at origin) must not poison gradients — sqrt/normalize at 0
    in sh_to_rgb, projection l/ts, and points_to_normal all NaN'd before."""
    import math

    import jax

    from ed3dgs_tpu.core.camera_math import points_to_normal
    from ed3dgs_tpu.core.projection import project_gaussians
    from ed3dgs_tpu.data.cameras import look_at_camera

    cam = look_at_camera((0, 0, 0), (0, 0, 2.2), (0, -1, 0),
                         math.radians(60), math.radians(60), 32, 32).matrices()
    xyz = jnp.asarray([[0.1, 0.1, 2.2], [0.0, 0.0, 0.0]], jnp.float32)
    scales = jnp.asarray([[0.05] * 3, [math.exp(-10)] * 3], jnp.float32)
    quats = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (2, 1))

    def f(x):
        p = project_gaussians(
            x, scales, quats, jnp.asarray([0.9, 0.5]),
            jnp.ones((2, 16, 3)) * 0.3,
            viewmatrix=jnp.asarray(cam.world_view),
            projmatrix=jnp.asarray(cam.full_proj),
            campos=jnp.asarray(cam.campos), width=32, height=32,
            tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
            focal_x=cam.focal_x, focal_y=cam.focal_y, sh_degree=3)
        return sum(jnp.sum(getattr(p, f).astype(jnp.float32)) for f in
                   ("mean2d", "depth", "conic", "opacity", "camera_planes",
                    "ray_plane", "normal", "ts", "rgb"))

    g = jax.grad(f)(xyz)
    assert bool(jnp.isfinite(g).all()), np.asarray(g)

    # flat coord regions (background pixels) in points_to_normal
    pts = jnp.zeros((3, 8, 8)).at[:, :4, :4].set(
        jnp.arange(48, dtype=jnp.float32).reshape(3, 4, 4) * 0.1)
    gn = jax.grad(lambda p: jnp.sum(points_to_normal(p)))(pts)
    assert bool(jnp.isfinite(gn).all())
