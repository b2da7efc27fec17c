"""Jitted training step + host-side training driver pieces.

The inner step re-creates the reference hot loop (train.py:123-448) as one
XLA computation: batched renders, the full loss assembly (L1 / periodic SSIM
/ opacity-mean / embedding-KNN / temporal-TV / depth-normal / tongue losses),
gradients (including the screen-space mean2d hook for densification stats),
and the 9-group Adam update. Densification runs as a separate jitted call on
its 100-iteration cadence.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.params import DeformHiddenConfig, ModelConfig, OptimizationConfig
from ..models import gaussians as gm
from ..models.deformation import init_deform_params
from ..ops import knn_loss
from ..ops.knn import knn as knn_op
from ..ops.rasterize import RasterConfig
from ..render import RenderSettings, render
from . import losses as L
from .densify import add_densification_stats, densify
from .optim import TrainState, build_optimizer, reset_moments_at


@dataclass(frozen=True)
class TrainSetup:
    """Static configuration of the jitted step (hashable)."""

    raster: RasterConfig
    hidden: DeformHiddenConfig
    batch_size: int
    white_background: bool = True
    kernel_size: float = 0.0
    disable_filter3d: bool = False
    use_coord_map: bool = False
    tongue_enabled: bool = False
    # loss coefficients (from OptimizationConfig)
    lambda_dssim: float = 0.0
    opacity_l1_coef: float = 0.0001
    reg_coef: float = 1.0
    coef_tv_temporal: float = 0.0
    lambda_depth_normal: float = 0.05
    radegs_from_iter: int = 15_000
    num_down_emb: int = 30
    sh_degree: int = 3
    # COLMAP point-cloud supervision (train.py:273-295): chamfer of GT cloud
    # samples to the deformed Gaussians, active after deform_from_iter
    colmap_supervision: bool = False
    deform_from_iter: int = 0
    # "scan" serializes the camera batch with lax.map — best single-chip (a
    # vmapped lax.sort lowers to a T(1,128) layout ~8x slower, and the grid
    # is serial per core anyway). "vmap" keeps B a real batch axis so the
    # pjit sharded path can partition it over the "data" mesh axis.
    batch_mode: str = "scan"
    # multi-chip rasterizer comms (SURVEY §2.11 / docs/hardware_day.md §3):
    # "gspmd" = annotate shardings, let GSPMD all-gather the projected
    # payload per camera (byte-bounded, g-independent — the shipped default);
    # "strip" = the explicit strip exchange: vmapped projection, then ONE
    # shard_map over both mesh axes whose body runs the per-camera
    # all_to_all pack/exchange/blend (parallel/tile_sharded.py:
    # batched_strip_rasterize). Requires batch_mode="vmap" and `mesh`.
    comms: str = "gspmd"
    mesh: Optional[object] = None          # jax Mesh (strip comms only)
    send_capacity: Optional[int] = None    # per-(src,dst) strip buffer rows



KNN_K = 20              # neighbors per gaussian (train.py:222 o3d_knn(..., 20))


class KnnCache(NamedTuple):
    graph: knn_loss.KnnGraph     # non-tongue embedding graph (prepared)
    t_graph: knn_loss.KnnGraph   # tongue graph (== graph when tongue off)


def _masked_coef(mask, k):
    m = mask.astype(jnp.float32)
    return m / jnp.maximum(jnp.sum(m) * k, 1.0)


def update_knn_cache(params: gm.GaussianParams, aux: gm.GaussianAux,
                     tongue_enabled: bool = False, k: int = KNN_K,
                     spill_a: int = 512, spill_b: int = 768,
                     far_capacity: int = 1 << 19) -> KnnCache:
    """Recompute the embedding-regularizer neighborhood graph
    (train.py:217-229) — on-device, replacing the reference's CPU Open3D
    KDTree stall. The graph is fully prepared here (Morton ranks, window
    locals, spill tables, far-pair schedule — see ops/knn_loss.py) so the
    per-step loss is two scatter-free fused kernels. Capacities are static;
    tools/train.py grows them adaptively when `graph.overflow` reports
    drops (like the rasterizer's pair-capacity buckets)."""
    def _pin_row_major(graph: knn_loss.KnnGraph) -> knn_loss.KnnGraph:
        # The far kernel streams [8, 256] blocks of far_aux, so it must
        # keep its natural row-major layout: XLA's layout assigner can flip
        # narrow arrays produced by the prepare computation and insert a
        # relayout copy EVERY step (measured 1.85 ms/step on the analogous
        # round-2 wc_t array) — pin it once here (the cache refreshes only
        # on the densify cadence).
        if jax.default_backend() not in ("tpu", "axon"):
            return graph
        try:
            from jax.experimental.layout import Format, Layout
            # jax Layout is MAJOR_to_minor: row-major for [8, F] is (0, 1)
            fmt = Format(Layout((0, 1)),
                         jax.sharding.SingleDeviceSharding(jax.devices()[0]))
            return graph._replace(far_aux=jax.device_put(graph.far_aux, fmt))
        except Exception:  # layout API unavailable: keep the per-step copy
            return graph

    tongue = jnp.round(aux.tongue_class[:, 0]) > 0.5
    mask = aux.alive & ~tongue
    C = aux.alive.shape[0]
    # masked slots go to a far shell with small per-slot spread. The shell must
    # stay ~1e3, not 1e6: the |a|^2+|b|^2-2ab distance expansion cancels
    # catastrophically in f32 for huge coordinates (measured d2 ~ -3e20 at 1e6,
    # whose exp(-2000*d2) is inf) — and distances are clamped >= 0 regardless.
    # The same shell points feed the Morton ordering: they line up along a
    # diagonal, so dead slots cluster into their own rank blocks.
    far = 1e3 + 1e-3 * jnp.arange(C, dtype=jnp.float32)[:, None]
    pts = jnp.where(mask[:, None], params.xyz, far)
    d2, idx = knn_op(pts, k=k)
    w = jnp.where(mask[:, None], jnp.exp(-2000.0 * jnp.maximum(d2, 0.0)), 0.0)
    graph = knn_loss.prepare_knn_graph(
        idx, w, _masked_coef(mask, k), pts, pts_valid=mask,
        spill_a=spill_a, spill_b=spill_b, far_capacity=far_capacity)
    if tongue_enabled:
        tmask = aux.alive & tongue
        tpts = jnp.where(tmask[:, None], params.xyz, -far)
        td2, tidx = knn_op(tpts, k=k)
        tw = jnp.where(tmask[:, None],
                       jnp.exp(-2000.0 * jnp.maximum(td2, 0.0)), 0.0)
        t_graph = knn_loss.prepare_knn_graph(
            tidx, tw, _masked_coef(tmask, k), tpts, pts_valid=tmask,
            spill_a=spill_a, spill_b=spill_b, far_capacity=far_capacity)
    else:
        t_graph = graph
    same = t_graph is graph
    graph = _pin_row_major(graph)
    t_graph = graph if same else _pin_row_major(t_graph)
    return KnnCache(graph, t_graph)


# Default / ceiling KNN-graph capacity buckets for refresh_knn_cache. The
# ceilings exist because a pathological cloud can demand spill/far buckets
# past what the fused kernels can reasonably run (the pre-round-5 Morton
# quantization bug made EVERY cloud look pathological — 85% far pairs —
# and the growth loop walked into configs that no longer compiled); at the
# ceiling the graph degrades deterministically (overflowing pairs
# weight-zeroed consistently in loss and both gradient halves).
KNN_CAPS_DEFAULT = {"spill_a": 256, "spill_b": 768, "far": 1 << 19}
KNN_CAPS_MAX = {"spill_a": 4096, "spill_b": 8192, "far": 1 << 21}


def refresh_knn_cache(params: gm.GaussianParams, aux: gm.GaussianAux,
                      caps: dict | None = None, *,
                      tongue_enabled: bool = False,
                      coverage_target: float = 0.95, k: int = KNN_K,
                      quiet: bool = True) -> KnnCache:
    """Build the KNN cache at adaptively sized capacity buckets.

    The Morton-window graph drops edges deterministically when a spill or
    far bucket overflows. This loop grows buckets (doubling, up to
    KNN_CAPS_MAX) until the total dropped-edge count fits the coverage
    budget `(1 - coverage_target) * alive * k`, then shrinks an oversized
    far bucket (power-of-2, 3-refresh hysteresis — unused far capacity
    costs padding grid steps every train step). coverage_target=1.0
    demands the exact graph (the reference's o3d_knn semantics,
    train.py:217-229) at whatever bucket cost the cloud requires.

    `caps` is MUTATED so callers keep bucket state across refreshes; the
    production CLI (tools/train.py) and bench.py both build their caches
    here, so benched steps run the same graph a real training run would."""
    caps = caps if caps is not None else dict(KNN_CAPS_DEFAULT)
    caps.setdefault("_far_quiet", 0)
    edges = int(jax.device_get(jnp.sum(aux.alive))) * k
    budget = (1.0 - coverage_target) * max(edges, 1)
    while True:
        cache = update_knn_cache(
            params, aux, tongue_enabled=tongue_enabled, k=k,
            spill_a=caps["spill_a"], spill_b=caps["spill_b"],
            far_capacity=caps["far"])
        ovf = np.asarray(jax.device_get(cache.graph.overflow))
        ovf = ovf + np.asarray(jax.device_get(cache.t_graph.overflow))
        if ovf.sum() <= budget:
            break
        grew = False
        for i, name in enumerate(("spill_a", "spill_b")):
            # any bucket above its budget share must grow; while the total
            # exceeds the budget at least one bucket exceeds budget/3
            if ovf[i] > budget / 3 and caps[name] < KNN_CAPS_MAX[name]:
                caps[name] *= 2
                grew = True
        if ovf[2] > budget / 3 and caps["far"] < KNN_CAPS_MAX["far"]:
            # far demand is exact at build time (graph.n_far): jump straight
            # to the snug 2^17-granular bucket instead of doubling
            demand = max(int(cache.graph.n_far), int(cache.t_graph.n_far))
            want = -(-int(demand * 1.25) // (1 << 17)) << 17
            caps["far"] = min(max(want, caps["far"] + (1 << 17)),
                              KNN_CAPS_MAX["far"])
            grew = True
        if not grew:
            print(f"[knn] WARNING: dropped-edge count {int(ovf.sum())} "
                  f"exceeds the coverage budget {budget:.0f} at the bucket "
                  f"ceiling {caps}; the KNN regularizer runs on a "
                  f"deterministically truncated graph")
            break
        if not quiet:
            print(f"[knn] overflow {ovf.tolist()} over budget "
                  f"{budget:.0f}; growing buckets to {caps}", flush=True)
    demand = max(int(cache.graph.n_far), int(cache.t_graph.n_far))
    # 2^17-granular buckets (not powers of two): every unused far-capacity
    # chunk costs a padding grid step per train step
    want = max(1 << 15, -(-int(max(demand, 1) * 1.25) // (1 << 17)) << 17)
    if want < caps["far"]:
        caps["_far_quiet"] += 1
        if caps["_far_quiet"] >= 3:
            caps["far"] = want
            caps["_far_quiet"] = 0
            if not quiet:
                print(f"[knn] far bucket -> {want} (demand {demand})",
                      flush=True)
            return refresh_knn_cache(
                params, aux, caps, tongue_enabled=tongue_enabled,
                coverage_target=coverage_target, k=k, quiet=quiet)
    else:
        caps["_far_quiet"] = 0
    return cache


def _render_one(params, aux, dparams, setup: TrainSetup, settings,
                iteration, offset, need_geo, tongue_filter=None):
    # oneupSHdegree every 1000 iterations (train.py:129-130), as a traced value
    active_sh = jnp.minimum(jnp.asarray(iteration, jnp.int32) // 1000,
                            setup.sh_degree)
    return render(
        params, aux, dparams, setup.hidden, settings, setup.raster,
        jnp.full((3,), 1.0 if setup.white_background else 0.0),
        iteration=iteration, sh_degree=setup.sh_degree,
        kernel_size=setup.kernel_size, disable_filter3d=setup.disable_filter3d,
        num_down_emb_c=setup.num_down_emb, num_down_emb_f=setup.num_down_emb,
        tongue_filter=tongue_filter, mean2d_offset=offset,
        active_sh_degree=active_sh,
    )


def _strip_render_batch(gparams, aux, dparams, setup: TrainSetup, batch_args,
                        iteration, need_geo):
    """Batched strip-exchange render for the sharded trainer (--comms strip).

    Projection stays a vmap over cameras (embarrassingly parallel along the
    gauss axis under GSPMD); the collective blend is hoisted OUT of the vmap
    into one shard_map whose body exchanges each local camera's payload with
    a single all_to_all over the gauss groups (batched_strip_rasterize) —
    instead of GSPMD's per-camera payload all-gather. Reference analogue:
    duplicateWithKeys feeding every tile (rasterizer_impl.cu:253-432)."""
    from ..ops.binning import build_gaussian_payload
    from ..parallel.tile_sharded import batched_strip_rasterize
    from ..render import project_for_render

    B = batch_args[0].shape[0]
    active_sh = jnp.minimum(jnp.asarray(iteration, jnp.int32) // 1000,
                            setup.sh_degree)

    def project_b(vm, pm, cp, tm, cn, off):
        settings = RenderSettings(vm, pm, cp, tm, cn)
        proj, _, xyz_f, _ = project_for_render(
            gparams, aux, dparams, setup.hidden, settings, setup.raster,
            iteration=iteration, sh_degree=setup.sh_degree,
            kernel_size=setup.kernel_size,
            disable_filter3d=setup.disable_filter3d,
            num_down_emb_c=setup.num_down_emb,
            num_down_emb_f=setup.num_down_emb,
            mean2d_offset=off, active_sh_degree=active_sh)
        payload = build_gaussian_payload(
            proj, aux.tongue_class[:, 0], pad=False)
        return proj, payload, xyz_f

    proj_b, payload_b, xyz_b = jax.vmap(project_b)(*batch_args)
    valid_b = proj_b.valid & (proj_b.tiles_touched > 0)
    bg = jnp.full((3,), 1.0 if setup.white_background else 0.0)
    out_b, send_ovf = batched_strip_rasterize(
        payload_b, proj_b.depth, valid_b, proj_b.rect_min, proj_b.rect_max,
        bg, setup.raster, setup.mesh, send_capacity=setup.send_capacity)

    renders = {
        "render": out_b.color,
        "radii": proj_b.radius,
        "visibility_filter": proj_b.radius > 0,
        "expected_depth": out_b.expected_depth,
        "median_depth": out_b.median_depth,
        "normal": out_b.normal,
        "expected_coord": out_b.expected_coord,
        "median_coord": out_b.median_coord,
        "tongue_mask": out_b.tongue,
        "num_pairs": jnp.sum(
            jnp.where(valid_b, proj_b.tiles_touched, 0), axis=1),
        "tile_overflow": jnp.broadcast_to(out_b.tile_overflow, (B,)),
    }
    if setup.colmap_supervision:
        renders["deformed_gaussian_positions"] = xyz_b
    return renders, send_ovf


def make_train_step(setup: TrainSetup, opt_cfg: OptimizationConfig,
                    optimizer, jit: bool = True):
    """Build the jitted train step. Batch entries (all leading dim B):
    gt_image [B,3,H,W], viewmatrix [B,4,4], projmatrix [B,4,4], campos [B,3],
    time [B], cam_no [B], tongue_gt [B,1,H,W] (zeros if unused),
    use_ssim [] bool (host-computed periodic SSIM gate, train.py:199)."""

    B = setup.batch_size

    def loss_fn(params_all, offsets, aux, batch, knn_cache, iteration):
        gparams: gm.GaussianParams = params_all["gaussians"]
        dparams = params_all["deform"]
        reg_kick_on = iteration >= setup.radegs_from_iter

        # over the camera batch: lax.map (single-chip, see batch_mode) or vmap
        # (sharded path: B stays a real batch axis that pjit partitions over
        # the "data" mesh axis for camera data-parallelism).
        def render_b(vm, pm, cp, tm, cn, off):
            settings = RenderSettings(vm, pm, cp, tm, cn)
            r = _render_one(gparams, aux, dparams, setup, settings,
                            iteration, off, reg_kick_on)
            keep = ("render", "radii", "visibility_filter", "expected_depth",
                    "median_depth", "normal", "expected_coord", "median_coord",
                    "tongue_mask", "num_pairs", "tile_overflow")
            if setup.colmap_supervision:
                keep = keep + ("deformed_gaussian_positions",)
            return {k: r[k] for k in keep}

        batch_args = (batch["viewmatrix"], batch["projmatrix"],
                      batch["campos"], batch["time"], batch["cam_no"], offsets)
        send_ovf = None
        if setup.comms == "strip":
            renders, send_ovf = _strip_render_batch(
                gparams, aux, dparams, setup, batch_args, iteration,
                reg_kick_on)
        elif setup.batch_mode == "scan":
            renders = jax.lax.map(lambda a: render_b(*a), batch_args)
        else:
            renders = jax.vmap(render_b)(*batch_args)

        image = renders["render"]                                # [B,3,H,W]
        gt = batch["gt_image"]
        l1_items = L.l1_loss(image, gt, keepdim=True)
        l1 = jnp.mean(l1_items)
        loss = l1

        ssim_val = jax.lax.cond(
            batch["use_ssim"],
            lambda: L.ssim(image, gt),
            lambda: jnp.float32(1.0))
        lssim = (1.0 - ssim_val) / 2.0
        loss = loss + setup.lambda_dssim * lssim * batch["use_ssim"]

        opa_loss = L.opacity_mean_loss(gparams.opacity, aux.alive)
        if setup.opacity_l1_coef > 0:
            loss = loss + setup.opacity_l1_coef * opa_loss

        emb_loss = knn_loss.knn_loss_fused(
            gparams.embedding, knn_cache.graph, KNN_K,
            jax.default_backend() == "cpu")
        loss = loss + setup.reg_coef * emb_loss

        tv_loss = jnp.float32(0.0)
        if setup.coef_tv_temporal > 0:
            tv_loss = L.temporal_tv_loss(dparams["weight"])
            loss = loss + setup.coef_tv_temporal * tv_loss

        # depth-normal on the LAST batch entry only (train.py:247-271)
        r_last = jax.tree_util.tree_map(lambda x: x[B - 1], renders)
        dn = jax.lax.cond(
            reg_kick_on,
            lambda: (L.coord_normal_loss(r_last["normal"], r_last["expected_coord"],
                                         r_last["median_coord"])
                     if setup.use_coord_map else
                     L.depth_normal_loss(r_last["normal"], r_last["expected_depth"],
                                         r_last["median_depth"],
                                         setup.raster.width, setup.raster.height,
                                         setup.raster.focal_x, setup.raster.focal_y)),
            lambda: jnp.float32(0.0))
        loss = loss + setup.lambda_depth_normal * dn

        # COLMAP point-cloud supervision on the last batch entry's deformed
        # positions (train.py:273-295); skipped entirely (lax.cond) before
        # deform_from_iter or when the host found no GT cloud for the frame
        pcd_loss = jnp.float32(0.0)
        if setup.colmap_supervision:
            gate = jnp.logical_and(iteration > setup.deform_from_iter,
                                   batch["pcd_valid"])
            pcd_loss = jax.lax.cond(
                gate,
                lambda: L.colmap_pcd_loss(
                    batch["pcd_points"],
                    r_last["deformed_gaussian_positions"], aux.alive),
                lambda: jnp.float32(0.0))
            loss = loss + 0.01 * pcd_loss  # closest_distance_coef (train.py:294)

        tongue_losses = {}
        if setup.tongue_enabled:
            tmask = jnp.round(aux.tongue_class[:, 0]) > 0.5
            gt_tongue = batch["tongue_gt"][-1]                    # [1,H,W]
            t_l1 = L.l1_loss(gt_tongue[None], r_last["tongue_mask"][None],
                             keepdim=True).mean()
            loss = loss + 5.0 * t_l1
            t_emb = knn_loss.knn_loss_fused(
                gparams.embedding, knn_cache.t_graph, KNN_K,
                jax.default_backend() == "cpu")
            loss = loss + setup.reg_coef * t_emb

            settings_last = RenderSettings(
                viewmatrix=batch["viewmatrix"][B - 1],
                projmatrix=batch["projmatrix"][B - 1],
                campos=batch["campos"][B - 1],
                time=batch["time"][B - 1],
                cam_no=batch["cam_no"][B - 1])
            gt_mean = jnp.mean(gt_tongue)
            r_tongue = _render_one(gparams, aux, dparams, setup, settings_last,
                                   iteration, None, reg_kick_on, "only")
            t_rgb = jnp.mean(jnp.abs(gt[-1] * gt_tongue - r_tongue["render"] * gt_tongue))
            t_rgb = jnp.where(gt_mean > 0.005, t_rgb / jnp.maximum(gt_mean, 1e-8), 0.0)
            loss = loss + t_rgb
            r_wo = _render_one(gparams, aux, dparams, setup, settings_last,
                               iteration, None, reg_kick_on, "without")
            inv = 1.0 - gt_tongue
            wo_rgb = jnp.mean(jnp.abs(gt[-1] * inv - r_wo["render"] * inv))
            wo_rgb = wo_rgb / jnp.maximum(jnp.mean(inv), 1e-8)
            loss = loss + 0.5 * wo_rgb
            tongue_losses = {"tongue_l1": t_l1, "tongue_emb": t_emb,
                             "tongue_rgb": t_rgb, "wo_tongue_rgb": wo_rgb}

        radii = renders["radii"].max(axis=0)
        visible = renders["visibility_filter"].any(axis=0)
        metrics = {
            "loss": loss, "l1": l1, "l1_items": l1_items,
            "psnr": jnp.mean(L.psnr(image, gt)),
            "ssim": ssim_val, "emb_loss": emb_loss, "tv_loss": tv_loss,
            "opacity_mean": opa_loss, "depth_normal": dn,
            "pcd_loss": pcd_loss,
            "num_pairs": jnp.max(renders["num_pairs"]),
            "tile_overflow": jnp.any(renders["tile_overflow"]),
            # strip comms only: max per-(src,dst) splat demand; > the
            # configured send_capacity means deepest splats were dropped and
            # the driver should re-jit with a larger buffer
            "send_overflow": (jnp.int32(0) if send_ovf is None
                              else send_ovf.astype(jnp.int32)),
            **tongue_losses,
        }
        return loss, (metrics, radii, visible)

    def train_step(state: TrainState, aux: gm.GaussianAux, batch, knn_cache):
        C = aux.alive.shape[0]
        offsets0 = jnp.zeros((B, C, 2), jnp.float32)
        # one autodiff pass: grads w.r.t. params AND the zero screen-space
        # offsets hook (the latter are the reference's viewspace grads for
        # densification stats, train.py:345-348)
        (loss, (metrics, radii, visible)), (grads, vs_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, offsets0, aux, batch, knn_cache, state.iteration)
        vs_grad_sum = jnp.sum(vs_grad, axis=0)  # summed over batch

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.iteration + 1)
        aux2 = add_densification_stats(aux, vs_grad_sum, visible, radii)
        return new_state, aux2, metrics

    return jax.jit(train_step) if jit else train_step


def make_densify_step(opt_cfg: OptimizationConfig, percent_dense: float,
                      scene_extent: float):
    @jax.jit
    def densify_step(state: TrainState, aux, key, grad_threshold):
        res = densify(state.params["gaussians"], aux, key,
                      grad_threshold=grad_threshold,
                      percent_dense=percent_dense,
                      scene_extent=scene_extent,
                      max_gaussians=opt_cfg.max_number_gaussians)
        params = dict(state.params)
        params["gaussians"] = res.params
        opt_state = reset_moments_at(state.opt_state, res.reset_mask)
        return (TrainState(params, opt_state, state.iteration), res.aux,
                res.n_cloned, res.n_split)

    return densify_step


def init_train_state(params: gm.GaussianParams, hidden: DeformHiddenConfig,
                     opt_cfg: OptimizationConfig, spatial_lr_scale: float,
                     seed: int = 0):
    dparams = init_deform_params(jax.random.PRNGKey(seed), hidden)
    all_params = {"gaussians": params, "deform": dparams}
    optimizer = build_optimizer(opt_cfg, spatial_lr_scale)
    opt_state = optimizer.init(all_params)
    return TrainState(all_params, opt_state, jnp.int32(0)), optimizer
