"""Training CLI — reference train.py equivalent.

Usage:
  python -m ed3dgs_tpu.tools.train -s <scene_dir> -m <model_dir> \
      [--configs cfg.py] [--loader dynerf] [--iterations N] ...

The hot loop is one jitted step (projection, binning, blending, full loss,
gradients, 9-group Adam) with host-side camera sampling and image staging;
densification / 3D-filter / KNN-cache refresh run on their reference cadences
(train.py:123-452).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from dataclasses import replace

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="ed3dgs_tpu trainer")
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--configs", default=None)
    p.add_argument("--loader", default=None)
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--duration", type=int, default=None)
    p.add_argument("--capacity", type=int, default=None,
                   help="Gaussian capacity (default: max_number_gaussians)")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--backend", default=None, choices=["auto", "xla", "pallas"])
    p.add_argument("--mesh", default=None, metavar="SPEC",
                   help="train on a multi-chip jax mesh: 'auto' (data axis "
                        "spans hosts, gauss axis spans local chips) or "
                        "'data=2,gauss=4' (0 = the rest). Multi-host runs "
                        "also need JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                        "JAX_PROCESS_ID in the environment.")
    p.add_argument("--comms", default="gspmd", choices=["gspmd", "strip"],
                   help="mesh-mode rasterizer comms: 'gspmd' (annotated "
                        "shardings; GSPMD all-gathers the projected payload "
                        "per camera) or 'strip' (explicit strip exchange: "
                        "one all_to_all per local camera, blend sharded "
                        "over image strips; parallel/tile_sharded.py)")
    p.add_argument("--save_iterations", type=int, nargs="+", default=None)
    p.add_argument("--checkpoint_iterations", type=int, nargs="+", default=[])
    p.add_argument("--start_checkpoint", default=None,
                   help="resume from a chkpnt<N>.npz (params + Adam state)")
    p.add_argument("--test_every", type=int, default=2000,
                   help="render a held-out test camera every N iterations and "
                        "log test/psnr (reference train.py:378-389 evaluates "
                        "at fixed test_iterations by default); 0 disables")
    p.add_argument("--no_tensorboard", action="store_true",
                   help="disable tfevents logging (reference train.py:488-493)")
    p.add_argument("--profile", type=int, default=0, metavar="N",
                   help="capture an XLA profiler trace of N steady-state "
                        "iterations (starting at iteration 20) to "
                        "<model_path>/profile; inspect with xprof/tensorboard "
                        "or scripts/dev_profile.py")
    p.add_argument("--seed", type=int, default=6666)
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE",
                   help="config overrides, e.g. --set kernel_size=0.1")
    return p.parse_args(argv)


def build_config(args):
    from ..config.loader import load_full_config
    from ..config.params import apply_overrides

    overrides = {"source_path": args.source_path, "model_path": args.model_path}
    for kv in args.set:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        overrides[k] = v
    if args.loader:
        overrides["loader"] = args.loader
    if args.iterations:
        overrides["iterations"] = args.iterations
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.backend:
        overrides["raster_backend"] = args.backend
    cfg = load_full_config(args.configs, overrides)
    return cfg


class PcdSupervisionLoader:
    """Host-side per-frame GT cloud sampler for the COLMAP supervision loss
    (train.py:273-295). Caches decoded clouds; samples `n` points per step
    for the last batch camera's frame."""

    def __init__(self, model, seed=0):
        self.dir = model.colmap_pcd_dir
        self.pattern = model.colmap_pcd_pattern
        self.mult = model.colmap_pcd_frame_multiplier
        self.n = model.colmap_pcd_samples
        self.seed = seed
        self._calls = 0
        self._cache = {}

    def sample(self, frame_no: int):
        """Returns (points [n,3] float32, valid bool).

        The RNG is derived per call from (seed, call#, frame): under
        multi-host meshes every host runs an identically-seeded sampler
        in lockstep, and a stateful generator would desync permanently if
        even one host's cloud file were missing (data-dependent draw
        counts). A per-call derivation makes the stream independent of
        what each host finds on disk."""
        rng = np.random.default_rng((self.seed, self._calls, frame_no))
        self._calls += 1
        pts = self._load(frame_no)
        if pts is None or len(pts) == 0:
            return np.zeros((self.n, 3), np.float32), False
        idx = rng.choice(len(pts), self.n, replace=len(pts) < self.n)
        return pts[idx], True

    def _load(self, frame_no: int):
        if frame_no in self._cache:
            return self._cache[frame_no]
        pts = None
        if self.dir:
            path = os.path.join(
                self.dir, self.pattern.format(frame=frame_no * self.mult))
            if os.path.exists(path):
                from ..data.pcd import load_pointcloud_any
                pts, _ = load_pointcloud_any(path)
        if len(self._cache) > 256:  # bound host memory
            self._cache.clear()
        self._cache[frame_no] = pts
        return pts


def stage_batch(cams, maxtime, use_ssim, tongue_enabled, pcd_loader=None,
                pcd_frame_no=None):
    """pcd_frame_no: frame of the GLOBAL batch's last camera. Under
    multi-host meshes `cams` is the host-local slice, but the pcd loss
    applies to the last entry of the global batch — every host stages the
    same (replicated) cloud because the sampler is identically seeded and
    the dataset is on every host's disk."""
    import jax.numpy as jnp

    mats = [c.matrices() for c in cams]
    imgs = []
    tongues = []
    for c in cams:
        img = c.image
        if img is None:
            raise FileNotFoundError(f"image missing: {c.image_path}")
        imgs.append(img)
        t = c.tongue_mask
        tongues.append(t if t is not None else np.zeros((1,) + img.shape[1:], np.float32))
    batch = {
        "gt_image": jnp.asarray(np.stack(imgs)),
        "viewmatrix": jnp.asarray(np.stack([m.world_view for m in mats])),
        "projmatrix": jnp.asarray(np.stack([m.full_proj for m in mats])),
        "campos": jnp.asarray(np.stack([m.campos for m in mats])),
        "time": jnp.asarray(np.array([c.time for c in cams], np.float32)),
        "cam_no": jnp.asarray(np.array([c.cam_no for c in cams], np.int32)),
        "use_ssim": jnp.asarray(bool(use_ssim)),
    }
    if tongue_enabled:
        batch["tongue_gt"] = jnp.asarray(np.stack(tongues))
    if pcd_loader is not None:
        frame = cams[-1].frame_no if pcd_frame_no is None else pcd_frame_no
        pts, valid = pcd_loader.sample(frame)
        batch["pcd_points"] = jnp.asarray(pts)
        batch["pcd_valid"] = jnp.asarray(valid)
    return batch


def training_report(tb, iteration, metrics, iter_time, total_points,
                    total_tongue):
    """The reference's per-iteration scalar set (train.py:505-524)."""
    g = lambda k: float(metrics[k]) if k in metrics else 0.0
    ssim_val = g("ssim")
    tb.add_scalar("train_loss_patches/l1_loss", g("l1"), iteration)
    tb.add_scalar("train_loss_patches/normal_loss", g("depth_normal"), iteration)
    tb.add_scalar("train_loss_patches/total_loss", g("loss"), iteration)
    tb.add_scalar("train_loss_patches/dssim_loss", (1.0 - ssim_val) / 2.0, iteration)
    tb.add_scalar("train_loss_patches/temporal_loss", g("tv_loss"), iteration)
    tb.add_scalar("train_loss_patches/embedding_loss", g("emb_loss"), iteration)
    tb.add_scalar("train_loss_patches/tongue_embedding_loss", g("tongue_emb"), iteration)
    tb.add_scalar("train_loss_patches/opacity_mean_loss", g("opacity_mean"), iteration)
    tb.add_scalar("train_loss_patches/psnr", g("psnr"), iteration)
    tb.add_scalar("train_loss_patches/colmap_pcd_loss", g("pcd_loss"), iteration)
    tb.add_scalar("train_loss_patches/tongue_loss", g("tongue_l1"), iteration)
    tb.add_scalar("train_loss_patches/wo_tongue_rgb_loss", g("wo_tongue_rgb"), iteration)
    tb.add_scalar("train_loss_patches/tongue_rgb_loss", g("tongue_rgb"), iteration)
    tb.add_scalar("iter_time", iter_time, iteration)
    tb.add_scalar("total_points", total_points, iteration)
    tb.add_scalar("total_tongue_gaussians", total_tongue, iteration)


def main(argv=None):
    args = parse_args(argv)
    cfg = build_config(args)
    run_training(cfg, args)


def run_training(cfg, args):
    import jax
    import jax.numpy as jnp

    from ..data.scene import Scene
    from ..models import gaussians as gm
    from ..ops.rasterize import RasterConfig
    from ..train import trainer
    from ..train.sampling import CameraSampler
    from ..train.capacity import CapacityPolicy
    from ..train.trainer import (TrainSetup, init_train_state,
                                 make_densify_step, make_train_step,
                                 update_knn_cache)

    t_start = time.time()
    model, opt, hidden, pipe = cfg.model, cfg.opt, cfg.hidden, cfg.pipe
    capacity = args.capacity or opt.max_number_gaussians

    # --- multi-chip mesh (SURVEY.md §2.11; greenfield — the reference is
    # single-GPU). "data" = camera batch parallelism (spans hosts over DCN),
    # "gauss" = Gaussian-axis sharding (spans chips over ICI).
    mesh = None
    if args.mesh:
        from ..parallel.multihost import (host_batch_slice,
                                          initialize_multihost,
                                          parse_mesh_spec, to_host)
        from ..parallel.sharded import (aux_shardings,
                                        make_sharded_train_step, shard_batch,
                                        shard_knn_cache, shard_train_state)
        initialize_multihost()
        mesh = parse_mesh_spec(args.mesh)
        data_ax = mesh.shape["data"]
        gauss_ax = mesh.shape["gauss"]
        if opt.batch_size % data_ax != 0:
            raise SystemExit(f"batch_size {opt.batch_size} must be divisible "
                             f"by the mesh data axis ({data_ax})")
        if capacity % gauss_ax != 0:  # leading-axis sharding needs even splits
            capacity += gauss_ax - capacity % gauss_ax
            print(f"capacity rounded up to {capacity} "
                  f"(multiple of gauss axis {gauss_ax})", flush=True)
    is_proc0 = True
    if mesh is not None:
        import jax as _jax
        is_proc0 = _jax.process_index() == 0

    os.makedirs(model.model_path, exist_ok=True)
    if is_proc0:
        with open(os.path.join(model.model_path, "cfg_args"), "w") as f:
            f.write(repr({"model": vars(model), "opt": vars(opt),
                          "hidden": vars(hidden)}))

    scene = Scene(model, hidden, capacity=capacity, duration=args.duration,
                  shuffle=False, seed=args.seed)
    train_cams = sorted(scene.train_cameras, key=lambda c: (c.cam_no, c.frame_no))
    cam0 = train_cams[0].matrices()

    rcfg = RasterConfig(
        width=cam0.width, height=cam0.height,
        focal_x=cam0.focal_x, focal_y=cam0.focal_y,
        pair_capacity=opt.pair_capacity, chunk=opt.raster_chunk,
        backend=opt.raster_backend,
        max_per_tile=2048)
    comms = args.comms if mesh is not None else "gspmd"
    strip_caps = {"send": max(64, -(-2 * capacity //
                                    (mesh.shape["gauss"] if mesh else 1)))}
    setup = TrainSetup(
        raster=rcfg, hidden=hidden, batch_size=opt.batch_size,
        white_background=model.white_background, kernel_size=model.kernel_size,
        disable_filter3d=model.disable_filter3D,
        use_coord_map=model.use_coord_map,
        tongue_enabled=model.tongue_mask_loss_enabled,
        lambda_dssim=opt.lambda_dssim, opacity_l1_coef=opt.opacity_l1_coef_fine,
        reg_coef=opt.reg_coef, coef_tv_temporal=opt.coef_tv_temporal_embedding,
        lambda_depth_normal=opt.lambda_depth_normal,
        radegs_from_iter=opt.radegs_regularization_from_iter,
        num_down_emb=hidden.min_embeddings, sh_degree=model.sh_degree,
        colmap_supervision=model.colmap_supervision_enabled,
        deform_from_iter=hidden.deform_from_iter,
        # vmap keeps B a real batch axis for the "data" mesh partition
        batch_mode="vmap" if mesh is not None else "scan",
        comms=comms, mesh=mesh,
        send_capacity=strip_caps["send"] if comms == "strip" else None)

    state, optimizer = init_train_state(scene.params, hidden, opt,
                                        scene.cameras_extent, seed=args.seed)
    aux = scene.aux
    first_iter = 1
    if args.start_checkpoint:
        state, aux, first_iter = load_checkpoint(args.start_checkpoint, state, aux)
        print(f"resumed from {args.start_checkpoint} at iteration {first_iter}",
              flush=True)
    if mesh is not None:
        state, aux = shard_train_state(mesh, state, aux)

    def make_step(setup):
        """jitted step; in mesh mode the pjit wrapper with explicit in/out
        shardings is built lazily on the first batch (it needs the batch
        structure, which is fixed for the whole run)."""
        if mesh is None:
            return make_train_step(setup, opt, optimizer)
        raw = make_train_step(setup, opt, optimizer, jit=False)
        cell = {}

        def step(state, aux, batch, knn_cache):
            if "fn" not in cell:
                cell["fn"] = make_sharded_train_step(raw, mesh, state, aux,
                                                     batch, knn_cache)
            return cell["fn"](state, aux, batch, knn_cache)

        return step

    step_fn = make_step(setup)
    densify_fn = make_densify_step(opt, opt.percent_dense, scene.cameras_extent)

    # camera metadata for sampling / 3D filter
    cam_ids = sorted({c.cam_no for c in train_cams})
    cam_index = {c: i for i, c in enumerate(cam_ids)}
    first_frames = [c for c in train_cams if c.frame_no == 0]
    centers = np.stack([c.matrices().campos for c in first_frames])
    by_key = {(c.cam_no, c.frame_no): c for c in train_cams}
    maxtime = scene.maxtime

    view_mats = jnp.asarray(np.stack([c.matrices().world_view for c in first_frames]))
    focals_x = jnp.asarray(np.array([c.matrices().focal_x for c in first_frames], np.float32))
    focals_y = jnp.asarray(np.array([c.matrices().focal_y for c in first_frames], np.float32))
    widths = jnp.asarray(np.array([c.width for c in first_frames], np.float32))
    heights = jnp.asarray(np.array([c.height for c in first_frames], np.float32))

    def refresh_filter(params, aux):
        if model.disable_filter3D:
            aux = aux._replace(filter_3d=jnp.zeros_like(aux.filter_3d))
        else:
            f = gm.compute_3d_filter(params.xyz, aux.alive, view_mats,
                                     focals_x, focals_y, widths, heights)
            aux = aux._replace(filter_3d=f)
        if mesh is not None:  # keep every aux leaf on its canonical sharding
            aux = jax.device_put(aux, aux_shardings(mesh, aux))
        return aux

    aux = refresh_filter(state.params["gaussians"], aux)

    sampler = CameraSampler(
        num_cams=len(cam_ids), maxtime=maxtime, camera_centers=centers,
        batch_size=opt.batch_size, random_until=opt.random_until,
        num_multiview_ssim=opt.num_multiview_ssim,
        sequential=model.sampling_sequential_frame_enabled,
        first_frame_then_sequential=model.sampling_first_frame_then_sequential_enabled,
        first_frame_change=model.sampling_first_frame_change,
        is_sample_from_past=model.is_sample_from_past,
        preference_frames=tuple(model.frame_indices_higher_preference),
        preference_probability=model.frame_preference_probability,
        seed=args.seed)

    # adaptive KNN-graph capacity buckets (grow-only, like the rasterizer's
    # pair capacity): when a refresh reports dropped spill/far entries, the
    # graph is re-prepared with the next bucket before training continues.
    # All hosts compute identical (replicated) caches, so the bucket
    # decisions agree deterministically across processes.
    knn_caps = dict(trainer.KNN_CAPS_DEFAULT)

    def refresh_knn(params, aux):
        cache = trainer.refresh_knn_cache(
            params, aux, knn_caps,
            tongue_enabled=model.tongue_mask_loss_enabled,
            coverage_target=opt.knn_coverage_target, quiet=args.quiet)
        return shard_knn_cache(mesh, cache) if mesh is not None else cache

    knn_cache = refresh_knn(state.params["gaussians"], aux)
    key = jax.random.PRNGKey(args.seed)

    final_iter = opt.iterations
    save_iters = set(args.save_iterations or [final_iter])
    ckpt_iters = set(args.checkpoint_iterations)
    ema_loss = 0.0
    log_path = os.path.join(model.model_path, "training_time.txt")

    def pick(c, f):
        cam = by_key.get((cam_ids[c % len(cam_ids)], int(f) % maxtime))
        if cam is None:  # sparse frame ids (nerfies warp ids): nearest frame
            options = [x for x in train_cams if x.cam_no == cam_ids[c % len(cam_ids)]]
            cam = min(options, key=lambda x: abs(x.frame_no - int(f) % maxtime))
        return cam

    # native async image staging: decode iteration i+1's batch on C++ worker
    # threads while the device runs step i (one-step-stale error sampling;
    # the reference's lazy PIL load stalls the loop instead, train.py:172)
    from ..data.native_staging import Stager
    stager = Stager(workers=2, load_tongue=model.tongue_mask_loss_enabled) \
        if Stager.available() else None

    def local_slice(cams):
        """The cameras THIS host must decode. Single-host: all of them. Multi-
        host: the contiguous slice matching this process's "data" shard (the
        sampler is identically seeded on every host, so the global batch is
        consistent without communication)."""
        if mesh is not None and jax.process_count() > 1:
            return cams[host_batch_slice(len(cams))]
        return cams

    def sample_batch(iteration):
        cams_idx, frames, use_ssim = sampler.sample(iteration, final_iter)
        cams = [pick(c, f) for c, f in zip(cams_idx, frames)]
        if stager is not None:
            for c in local_slice(cams):
                stager.submit(c)
        return cams, use_ssim

    pcd_loader = (PcdSupervisionLoader(model, seed=args.seed)
                  if model.colmap_supervision_enabled else None)

    def stage(cams, use_ssim):
        # pcd supervision keys to the GLOBAL batch's last camera; every
        # host stages the same replicated cloud (identically-seeded
        # samplers), so multi-host needs no extra communication
        b = stage_batch(local_slice(cams), maxtime, use_ssim,
                        model.tongue_mask_loss_enabled, pcd_loader,
                        pcd_frame_no=cams[-1].frame_no)
        if mesh is None:
            return b
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            from ..parallel.sharded import batch_shardings
            if pcd_loader is not None:
                # The pcd cloud is staged replicated; if one host is
                # missing a cloud file its pcd_valid diverges and the
                # "replicated" spec silently feeds different values into
                # the jitted lax.cond. Fail loudly instead.
                multihost_utils.assert_equal(
                    np.asarray([int(cams[-1].frame_no),
                                int(np.asarray(b["pcd_valid"]))], np.int32),
                    fail_message="colmap-pcd supervision desynced across "
                    "hosts: a cloud file present on some hosts is missing "
                    "on others (check colmap_pcd_dir on every host)")
            shs = batch_shardings(mesh, b)
            return {k: multihost_utils.host_local_array_to_global_array(
                        np.asarray(v), mesh, shs[k].spec)
                    for k, v in b.items()}
        return shard_batch(mesh, b)

    tb = None
    if not args.no_tensorboard and is_proc0:
        from ..utils.tb_writer import SummaryWriter
        tb = SummaryWriter(model.model_path)

    # periodic held-out test PSNR (reference train.py:378-389)
    test_cams = list(scene.test_cameras)
    eval_rng = np.random.default_rng(args.seed)

    from ..render import RenderSettings
    from ..render import render as render_fn
    from ..train import losses as L

    # keyed by the CURRENT raster config: the adaptive capacity policy
    # re-jits the train step onto bigger pair buffers as the scene
    # densifies, and eval renders must follow or they silently drop pairs
    _eval_cache = {}

    def _eval_render(gparams, aux_, dparams, vm, pm, cp, t, it):
        fn = _eval_cache.get(rcfg)
        if fn is None:
            cfg = rcfg

            @jax.jit
            def fn(gparams, aux_, dparams, vm, pm, cp, t, it):
                s = RenderSettings(vm, pm, cp, t, jnp.int32(0))
                return render_fn(
                    gparams, aux_, dparams, hidden, s, cfg,
                    jnp.full((3,), 1.0 if model.white_background else 0.0),
                    iteration=it, sh_degree=model.sh_degree,
                    kernel_size=model.kernel_size,
                    disable_filter3d=model.disable_filter3D,
                    num_down_emb_c=hidden.min_embeddings,
                    num_down_emb_f=hidden.min_embeddings)["render"]

            _eval_cache[rcfg] = fn
        return fn(gparams, aux_, dparams, vm, pm, cp, t, it)

    def eval_test_psnr(iteration):
        cam = test_cams[eval_rng.integers(len(test_cams))]
        img = cam.image
        if img is None:
            return None
        m = cam.matrices()
        out = _eval_render(state.params["gaussians"], aux,
                           state.params["deform"],
                           jnp.asarray(m.world_view), jnp.asarray(m.full_proj),
                           jnp.asarray(m.campos), jnp.float32(cam.time),
                           jnp.asarray(iteration, jnp.int32))
        cam.release_image()
        return float(jnp.mean(L.psnr(out[None], jnp.asarray(img)[None])))

    # adaptive pair capacity (see train/capacity.py): re-jit the step onto a
    # snug bucket as the reported pair demand drifts
    cap_policy = CapacityPolicy(capacity=rcfg.pair_capacity)
    cap_policy.start(first_iter)

    def maybe_resize_capacity(iteration, num_pairs, send_overflow=0):
        nonlocal rcfg, setup, step_fn
        want = cap_policy.observe(iteration, num_pairs)
        if want is not None:
            if not args.quiet:
                print(f"[{iteration}] pair_capacity {rcfg.pair_capacity} -> "
                      f"{want} (re-jit)", flush=True)
            rcfg = replace(rcfg, pair_capacity=want)
            setup = replace(setup, raster=rcfg)
            step_fn = make_step(setup)
        if comms == "strip" and send_overflow > strip_caps["send"]:
            # strip buffers truncated the deepest splats: grow + re-jit
            # (same contract as the rasterizer's pair-capacity buckets)
            while strip_caps["send"] < send_overflow:
                strip_caps["send"] *= 2
            print(f"[{iteration}] strip send_capacity -> "
                  f"{strip_caps['send']} (re-jit)", flush=True)
            setup = replace(setup, send_capacity=strip_caps["send"])
            step_fn = make_step(setup)

    pending = sample_batch(first_iter)
    t_iter = time.time()
    prof_start = first_iter + 19 if args.profile else -1
    prof_stop = prof_start + args.profile
    for iteration in range(first_iter, final_iter + 1):
        cams, use_ssim = pending
        if stager is not None:
            for c in local_slice(cams):
                stager.fetch_into(c)
        if iteration < final_iter:
            pending = sample_batch(iteration + 1)
        if iteration == prof_start:
            jax.profiler.start_trace(os.path.join(model.model_path, "profile"))
        batch = stage(cams, use_ssim)
        state, aux, metrics = step_fn(state, aux, batch, knn_cache)
        if iteration == prof_stop:
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            print(f"profiler trace written to "
                  f"{os.path.join(model.model_path, 'profile')}", flush=True)

        l1_items = np.asarray(jax.device_get(metrics["l1_items"])
                              if mesh is None
                              else to_host(metrics["l1_items"]))
        sampler.record_loss([cam_index.get(c.cam_no, 0) for c in cams],
                            [c.frame_no for c in cams], l1_items)
        maybe_resize_capacity(iteration, int(metrics["num_pairs"]),
                              int(metrics.get("send_overflow", 0)))
        for c in local_slice(cams):
            c.release_image()

        if iteration < opt.densify_until_iter and iteration > opt.densify_from_iter \
                and iteration % opt.densification_interval == 0:
            thr = (opt.densify_grad_threshold_fine_init
                   - iteration * (opt.densify_grad_threshold_fine_init
                                  - opt.densify_grad_threshold_after)
                   / opt.densify_until_iter)
            key, sub = jax.random.split(key)
            state, aux, n_c, n_s = densify_fn(state, aux, sub, thr)
            if mesh is not None:  # densify_fn is un-annotated: re-pin shardings
                state, aux = shard_train_state(mesh, state, aux)
            aux = refresh_filter(state.params["gaussians"], aux)
            knn_cache = refresh_knn(state.params["gaussians"], aux)
        elif (iteration % 100 == 0 and iteration > opt.densify_until_iter
                and not model.disable_filter3D and iteration < final_iter - 100):
            aux = refresh_filter(state.params["gaussians"], aux)

        if tb is not None:
            now = time.time()
            training_report(
                tb, iteration, metrics, now - t_iter,
                int(jnp.sum(aux.alive)),
                int(jnp.sum(aux.alive & (aux.tongue_class[:, 0] > 0.5)))
                if model.tongue_mask_loss_enabled else 0)
            t_iter = now
        if args.test_every > 0 and iteration % args.test_every == 0 and test_cams:
            tp = eval_test_psnr(iteration)
            if tp is not None:
                if tb is not None:
                    tb.add_scalar("test/psnr", tp, iteration)
                if not args.quiet:
                    print(f"[{iteration}] test psnr {tp:.2f}", flush=True)

        if not args.quiet and iteration % 100 == 0:
            loss = float(metrics["loss"])
            ema_loss = 0.4 * loss + 0.6 * ema_loss
            n_pts = int(jnp.sum(aux.alive))
            print(f"[{iteration}/{final_iter}] loss={ema_loss:.5f} "
                  f"psnr={float(metrics['psnr']):.2f} points={n_pts}",
                  flush=True)

        if iteration in save_iters:
            elapsed = time.time() - t_start
            n_pts = int(jnp.sum(aux.alive))
            if is_proc0:
                with open(log_path, "a") as f:
                    f.write(f"Iteration {iteration}: {elapsed} seconds "
                            f"points: {n_pts}\n")
            save_state = (state, aux) if mesh is None else to_host((state, aux))
            if is_proc0:
                scene.save(iteration, save_state[0].params["gaussians"],
                           save_state[1], save_state[0].params["deform"])
        if iteration in ckpt_iters:
            save_state = (state, aux) if mesh is None else to_host((state, aux))
            if is_proc0:
                save_checkpoint(model.model_path, iteration,
                                save_state[0], save_state[1])

    return scene, state, aux


def save_checkpoint(model_path, iteration, state, aux):
    """Full optimizer checkpoint (reference chkpnt<it>.pth, train.py:450-452)."""
    from ..data.scene import flatten_pytree
    flat = flatten_pytree({"params": state.params,
                           "opt_state": state.opt_state, "aux": aux._asdict()})
    flat = {k: v for k, v in flat.items() if v.dtype != object}
    np.savez(os.path.join(model_path, f"chkpnt{iteration}.npz"),
             iteration=iteration, **flat)


def load_checkpoint(path, state, aux):
    """Restore a chkpnt<N>.npz into a freshly-built state (the reference's
    restore path, minus its field-order bug, gaussian_model.py:91-110)."""
    import jax
    from ..data.scene import unflatten_into
    from ..train.optim import TrainState

    with np.load(path) as data:
        flat = dict(data)
    iteration = int(flat.pop("iteration"))
    tmpl = {"params": state.params, "opt_state": state.opt_state,
            "aux": aux._asdict()}
    # numeric leaves restore; non-array leaves (schedule counts etc.) keep the
    # freshly-initialized value when absent from the archive
    def restore(template, prefix=""):
        if isinstance(template, dict):
            return {k: restore(v, f"{prefix}{k}/") for k, v in template.items()}
        if hasattr(template, "_fields"):
            return type(template)(*[restore(getattr(template, k), f"{prefix}{k}/")
                                    for k in template._fields])
        if isinstance(template, (list, tuple)):
            return type(template)([restore(v, f"{prefix}{i}/")
                                   for i, v in enumerate(template)])
        key = prefix[:-1]
        if key in flat:
            import jax.numpy as jnp
            return jnp.asarray(flat[key])
        return template

    restored = restore(tmpl)
    new_state = TrainState(params=restored["params"],
                           opt_state=restored["opt_state"],
                           iteration=state.iteration * 0 + iteration)
    new_aux = type(aux)(**restored["aux"])
    return new_state, new_aux, iteration + 1


if __name__ == "__main__":
    sys.exit(main())
