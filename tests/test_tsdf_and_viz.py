"""TSDF fusion + gaussian ellipsoid viz tests."""

import math

import numpy as np

from ed3dgs_tpu.mesh.gaussians_viz import gaussians_to_mesh, icosphere
from ed3dgs_tpu.mesh.tsdf import fuse_depths


def synthetic_depth_sphere(w=64, h=64, fov=math.radians(60.0),
                           center=(0, 0, 2.0), radius=0.5, world_view=None):
    """Analytic z-depth of a sphere from a camera at the origin (+z fwd)."""
    f = w / (2 * math.tan(fov / 2))
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    dx = (xs + 0.5 - w / 2) / f
    dy = (ys + 0.5 - h / 2) / f
    d = np.stack([dx, dy, np.ones_like(dx)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    c = np.asarray(center, float)
    b = d @ c
    disc = b ** 2 - (c @ c - radius ** 2)
    hit = disc > 0
    t = b - np.sqrt(np.maximum(disc, 0))
    depth = np.where(hit & (t > 0), t * d[..., 2], 0.0)  # z-depth
    return depth.astype(np.float32), f


def test_tsdf_sphere():
    depth, f = synthetic_depth_sphere()
    wv = np.eye(4)
    color = np.full(depth.shape + (3,), 0.5, np.float32)
    verts, faces, cols = fuse_depths(
        [depth], [color], [wv], [(f, f)], voxel_size=0.03)
    assert len(verts) > 100 and len(faces) > 100
    # visible front hemisphere: vertices near the analytic sphere
    r = np.linalg.norm(verts - np.array([0, 0, 2.0]), axis=1)
    assert np.abs(np.median(r) - 0.5) < 0.08
    assert cols.shape == (len(verts), 3)


def test_tsdf_two_views_consistency():
    depth, f = synthetic_depth_sphere()
    # second camera shifted slightly along x, same orientation
    wv2 = np.eye(4)
    wv2[0, 3] = -0.1  # world->cam translation: camera at x=+0.1
    depth2, _ = synthetic_depth_sphere(center=(-0.1, 0, 2.0))
    verts, faces, _ = fuse_depths(
        [depth, depth2], [None, None], [np.eye(4), wv2], [(f, f), (f, f)],
        voxel_size=0.03)
    r = np.linalg.norm(verts - np.array([0, 0, 2.0]), axis=1)
    assert np.abs(np.median(r) - 0.5) < 0.08


def test_gaussians_viz():
    rng = np.random.default_rng(0)
    n = 20
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    scales = np.full((n, 3), 0.05, np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opac = np.linspace(0, 1, n).astype(np.float32)
    verts, faces, vcols = gaussians_to_mesh(pos, scales, q, cols, opac,
                                            opacity_threshold=0.5)
    kept = (opac >= 0.5).sum()
    nv = len(icosphere(1)[0])
    assert len(verts) == kept * nv
    assert faces.max() == len(verts) - 1
    assert len(vcols) == len(verts)
    # each ellipsoid sits near its gaussian center
    first_center = verts[:nv].mean(axis=0)
    assert np.linalg.norm(first_center - pos[opac >= 0.5][0]) < 0.05


def test_tsdf_sparse_sphere():
    """Sparse block-hashed fusion reconstructs the sphere like the dense path."""
    from ed3dgs_tpu.mesh.tsdf_sparse import SparseTsdfVolume, fuse_depths_sparse

    depth, f = synthetic_depth_sphere()
    wv = np.eye(4)
    color = np.full(depth.shape + (3,), 0.5, np.float32)
    verts, faces, cols = fuse_depths_sparse(
        [depth], [color], [wv], [(f, f)], voxel_size=0.03)
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts - np.array([0, 0, 2.0]), axis=1)
    assert np.abs(np.median(r) - 0.5) < 0.08
    assert cols.shape == (len(verts), 3)
    # memory scales with surface area: at realistic resolution the allocated
    # band is far smaller than the dense bounding-box grid
    vol = SparseTsdfVolume(0.01)
    vol.integrate(depth, color, wv, f, f)
    dense_voxels = np.prod(np.ptp(vol.voxel_coords(), axis=0) + 1)
    assert vol.n_blocks * 512 < 0.6 * dense_voxels


def test_tsdf_sparse_matches_dense():
    """Same inputs -> sparse and dense surfaces agree geometrically."""
    from ed3dgs_tpu.mesh.tsdf_sparse import fuse_depths_sparse

    depth, f = synthetic_depth_sphere()
    wv2 = np.eye(4)
    wv2[0, 3] = -0.1
    depth2, _ = synthetic_depth_sphere(center=(-0.1, 0, 2.0))
    args = ([depth, depth2], [None, None], [np.eye(4), wv2], [(f, f), (f, f)])
    vd, fd, _ = fuse_depths(*args, voxel_size=0.03)
    vs, fs, _ = fuse_depths_sparse(*args, voxel_size=0.03)
    # identical voxel lattice anchored differently -> compare as point sets
    rd = np.linalg.norm(vd - np.array([0, 0, 2.0]), axis=1)
    rs = np.linalg.norm(vs - np.array([0, 0, 2.0]), axis=1)
    assert abs(np.median(rd) - np.median(rs)) < 0.02
    assert 0.5 < len(vs) / max(len(vd), 1) < 2.0
    # every sparse vertex has a dense vertex within ~one voxel
    d2 = np.min(np.linalg.norm(vs[:, None, :] - vd[None, :, :], axis=-1), axis=1)
    assert np.percentile(d2, 95) < 0.06
