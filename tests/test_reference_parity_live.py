"""Cross-validation against the LIVE reference modules (VERDICT r4 item 4).

Earlier parity tests re-derived the torch pipeline inside the test, which
verifies our *reading* of the reference, not the reference itself. These
tests import the actual files from /root/reference (deformation.py,
graphics_utils.py, colmap_loader.py) and compare at matched weights/inputs.

The reference modules are CUDA-assuming (.cuda() calls inside
get_temporal_embed); a test-local shim maps .cuda() to identity so they run
on this CPU-only host. No reference code is copied — it is imported.
"""

import importlib.util
import math
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _load_ref(name, relpath):
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def cuda_shim():
    """Map .cuda() to identity (reference deformation.py:61 calls it on a
    fresh tensor inside get_temporal_embed)."""
    orig_t = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    yield
    torch.Tensor.cuda = orig_t


def test_world_to_view_matches_live_reference():
    gu = _load_ref("ref_graphics_utils", "utils/graphics_utils.py")
    from ed3dgs_tpu.core.camera_math import world_to_view

    rng = np.random.default_rng(0)
    for i in range(5):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        t = rng.normal(size=3)
        trans = rng.normal(size=3) * 0.1
        scale = float(rng.uniform(0.5, 2.0))
        want = gu.getWorld2View2(R, t, trans, scale)
        got = world_to_view(R, t, tuple(trans), scale)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_projection_matrix_cv_matches_live_reference():
    gu = _load_ref("ref_graphics_utils", "utils/graphics_utils.py")
    from ed3dgs_tpu.core.camera_math import (projection_matrix,
                                             projection_matrix_cv)

    for fovx, fovy, cx, cy in [(1.0, 0.8, 0.0, 0.0), (0.9, 0.9, 0.08, -0.05),
                               (1.2, 0.7, -0.3, 0.2)]:
        want = gu.getProjectionMatrixCV(0.01, 100.0, fovx, fovy, cx, cy)
        got = projection_matrix_cv(0.01, 100.0, fovx, fovy, cx, cy)
        np.testing.assert_allclose(got, want.numpy(), atol=1e-6)
        if cx == cy == 0.0:
            want0 = gu.getProjectionMatrix(0.01, 100.0, fovx, fovy)
            np.testing.assert_allclose(projection_matrix(0.01, 100.0, fovx, fovy),
                                       want0.numpy(), atol=1e-6)


def test_colmap_binary_read_by_live_reference(tmp_path):
    """Files written by our colmap writer parse identically through the
    reference's colmap_loader binary readers."""
    cl = _load_ref("ref_colmap_loader", "scene/colmap_loader.py")
    from ed3dgs_tpu.data import colmap

    rng = np.random.default_rng(3)
    cams, ims = {}, {}
    for i in (1, 2):
        cams[i] = colmap.ColmapCamera(
            i, "PINHOLE" if i == 1 else "SIMPLE_PINHOLE", 64 * i, 48 * i,
            np.array([50.0, 51.0, 32.0, 24.0]) if i == 1
            else np.array([55.0, 32.0, 24.0]))
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        ims[i] = colmap.ColmapImage(i, q, rng.normal(size=3), i,
                                    f"cam{i:02d}.png")
    colmap.write_cameras_binary(str(tmp_path / "cameras.bin"), cams)
    colmap.write_images_binary(str(tmp_path / "images.bin"), ims)

    ref_cams = cl.read_intrinsics_binary(str(tmp_path / "cameras.bin"))
    ref_ims = cl.read_extrinsics_binary(str(tmp_path / "images.bin"))
    for i in (1, 2):
        assert ref_cams[i].model == cams[i].model
        assert ref_cams[i].width == cams[i].width
        assert ref_cams[i].height == cams[i].height
        np.testing.assert_allclose(ref_cams[i].params, cams[i].params)
        np.testing.assert_allclose(ref_ims[i].qvec, ims[i].qvec, atol=1e-12)
        np.testing.assert_allclose(ref_ims[i].tvec, ims[i].tvec, atol=1e-12)
        assert ref_ims[i].name == ims[i].name
        # our writer emits zero observations; the reference reader's
        # R/qvec2rotmat roundtrip still applies
        np.testing.assert_allclose(cl.qvec2rotmat(ref_ims[i].qvec),
                                   colmap.qvec_to_rotmat(ims[i].qvec),
                                   atol=1e-12)


def _args_ns(cfg):
    class NS:
        pass
    ns = NS()
    for k in ("temporal_embedding_dim", "gaussian_embedding_dim",
              "c2f_temporal_iter", "zero_temporal", "no_ds", "no_dr",
              "no_do", "no_dc", "use_anneal", "deform_from_iter",
              "no_coarse_deform", "no_fine_deform",
              "no_c2f_temporal_embedding", "use_coarse_temporal_embedding"):
        setattr(ns, k, getattr(cfg, k))
    return ns


def _to_ref_state(params, D):
    """Our pytree -> reference deform_network state_dict (torch Linear stores
    weight as [out, in])."""
    sd = {"weight": torch.tensor(np.asarray(params["weight"])),
          "offsets": torch.tensor(np.asarray(params["offsets"]))}
    head_map = {"pos": "pos_deform", "scale": "scales_deform",
                "rot": "rotations_deform", "opacity": "opacity_deform",
                "sh": "rgb_deform"}
    for tower, suffix in (("coarse", "c"), ("fine", "f")):
        tw = params[tower]
        for i, layer in enumerate(tw["feature"]):
            idx = 0 if i == 0 else 2 * i  # Sequential: Linear, (ReLU, Linear)*
            sd[f"feature_out_{suffix}.{idx}.weight"] = torch.tensor(
                np.asarray(layer["w"]).T)
            sd[f"feature_out_{suffix}.{idx}.bias"] = torch.tensor(
                np.asarray(layer["b"]))
        for ours, theirs in head_map.items():
            for j, idx in ((0, 1), (1, 3)):  # Sequential(ReLU,Lin,ReLU,Lin)
                layer = tw["heads"][ours][j]
                sd[f"{theirs}_{suffix}.{idx}.weight"] = torch.tensor(
                    np.asarray(layer["w"]).T)
                sd[f"{theirs}_{suffix}.{idx}.bias"] = torch.tensor(
                    np.asarray(layer["b"]))
    return sd


@pytest.mark.parametrize("iteration,use_anneal,cam_no", [
    (0, False, 1),
    (5000, True, 0),
    (123456, False, 2),   # past c2f_temporal_iter: full table
])
def test_deform_network_matches_live_reference(cuda_shim, iteration,
                                               use_anneal, cam_no):
    """Forward of the ACTUAL reference deform_network at matched weights ==
    our deform_forward (positions/scales/rotations/opacity/SH, both towers,
    temporal c2f sampling, per-camera offsets, anneal coefs)."""
    import jax
    import jax.numpy as jnp

    from ed3dgs_tpu.config.params import DeformHiddenConfig
    from ed3dgs_tpu.models.deformation import (deform_forward,
                                               init_deform_params)

    ref_def = _load_ref("ref_deformation", "scene/deformation.py")

    cfg = DeformHiddenConfig(net_width=32, defor_depth=2, min_embeddings=6,
                             max_embeddings=12, temporal_embedding_dim=16,
                             gaussian_embedding_dim=8, use_anneal=use_anneal,
                             c2f_temporal_iter=20000,
                             bf16_activations=False)  # f32 parity pin
    params = init_deform_params(jax.random.PRNGKey(1), cfg)
    # nonzero offsets so the per-camera branch is meaningful
    params["offsets"] = jnp.asarray(
        np.linspace(-0.02, 0.02, cfg.max_cameras, dtype=np.float32)[:, None])

    net = ref_def.deform_network(
        D=cfg.defor_depth, W=cfg.net_width,
        min_embeddings=cfg.min_embeddings, max_embeddings=cfg.max_embeddings,
        num_frames=30, args=_args_ns(cfg))
    missing, unexpected = net.load_state_dict(_to_ref_state(params, cfg.defor_depth))
    assert not missing and not unexpected

    rng = np.random.default_rng(7)
    N = 40
    xyz = rng.normal(size=(N, 3)).astype(np.float32)
    scales = rng.normal(size=(N, 3)).astype(np.float32)
    rots = rng.normal(size=(N, 4)).astype(np.float32)
    opac = rng.normal(size=(N, 1)).astype(np.float32)
    sh = rng.normal(size=(N, 16, 3)).astype(np.float32) * 0.2
    emb = rng.normal(size=(N, cfg.gaussian_embedding_dim)).astype(np.float32)
    t = 0.37

    with torch.no_grad():
        r_pts, r_sc, r_rot, r_op, r_sh, _ = net(
            torch.tensor(xyz), torch.tensor(scales), torch.tensor(rots),
            torch.tensor(opac),
            time_emb=torch.full((N, 1), t),
            cam_no=cam_no, embeddings=torch.tensor(emb),
            sh_coefs=torch.tensor(sh), iter=iteration,
            num_down_emb_c=cfg.min_embeddings,
            num_down_emb_f=cfg.min_embeddings)

    (o_pts, o_sc, o_rot, o_op, o_sh), _ = deform_forward(
        params, cfg, jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(rots),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(emb),
        jnp.float32(t), iteration, cam_no=jnp.int32(cam_no),
        num_down_emb_c=cfg.min_embeddings, num_down_emb_f=cfg.min_embeddings)

    np.testing.assert_allclose(np.asarray(o_pts), r_pts.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_sc), r_sc.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_rot), r_rot.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_op), r_op.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_sh), r_sh.numpy(),
                               rtol=1e-4, atol=1e-5)
