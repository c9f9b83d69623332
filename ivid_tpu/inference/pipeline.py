"""Sequential uncond→cond multiview RGBD scene generation — the product pipeline.

TPU-native redesign of the reference's iterative sampling loop
(reference: inference/sample.py:29-147). Structure per batch:

1. Sample the first view with the unconditional model (1000-step DDPM or strided
   DDIM), as ONE compiled scan.
2. For each novel view: aggregate all previously generated views into an RGBD
   condition (on-device rasterization — no GPU↔CPU↔OpenGL round trip, the
   reference's critical-path pathology, sample.py:83-126), pack the InpaintCFG
   condition, and run guided DDIM completion with the replace/constrain hooks
   (weights 0.1/0.2/0.5, sample.py:104-119).
3. Lift each completed view to a flag-annotated mesh (frustum skirt, normals) and
   append it to the scene state.

Scene state lives in fixed-slot batched pytrees (max_views slots, like the
reference renderer's 27 VBO slots) so every per-view step hits the same compiled
program; slot counts are bucketed to powers of two to avoid paying full 27-slot
rasterization for early views.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ivid_tpu.diffusion import samplers
from ivid_tpu.diffusion.samplers import PredX0Edits
from ivid_tpu.ops import geometry as geom
from ivid_tpu.ops import renderer as rend
from ivid_tpu.ops import warp as warp_ops


@dataclasses.dataclass
class SceneState:
    """Batched fixed-slot scene accumulation: Mesh pytree with [B, N, ...] leaves,
    colors [B, N, s, s, 3], valid [N] (same across batch)."""

    meshes: geom.Mesh
    colors: jnp.ndarray
    valid: np.ndarray  # host-side bool [N]

    @property
    def max_views(self) -> int:
        return self.colors.shape[1]


def _slot_bucket(count: int, max_views: int) -> int:
    """Slot-count bucket covering ``count`` live views.

    Buckets trade compiled program count against padded slot work (invalid
    slots raster at full cost). ``IVID_TPU_SLOT_BUCKETS``:

    - ``mult4`` (default): multiples of 4 — 7 programs, Σ=390 slot-rasters
      over an uncapped 3x9 sequence (pow2's 6 programs cost Σ=441; exact's
      26 programs cost Σ=351 but each costs minutes of remote compile).
    - ``pow2``: round-2 behavior.  - ``exact``: no padding.
    """
    import os

    mode = os.environ.get("IVID_TPU_SLOT_BUCKETS", "mult4")
    if mode == "exact":
        return min(count, max_views)
    if mode == "mult4":
        b = max(4, -4 * (-count // 4))
    else:
        b = 1
        while b < count:
            b *= 2
    return min(b, max_views)


def _camera_dirs(mvs: np.ndarray) -> np.ndarray:
    """Unit camera-position directions from [..., 4, 4] modelviews (host).

    ``pos = -R^T t`` (the camera center in world space); views orbit the
    object at the origin, so the position direction is the view direction."""
    rot = mvs[..., :3, :3]
    t = mvs[..., :3, 3]
    pos = -np.einsum("...ji,...j->...i", rot, t)
    return pos / np.maximum(np.linalg.norm(pos, axis=-1, keepdims=True), 1e-12)


def select_nearest_views(mvs: np.ndarray, j: int, k: int) -> np.ndarray:
    """Indices [B, k] of the ``k`` prior views (slots 0..j-1) angularly nearest
    to novel view ``j``, per sample.

    Rationale: the aggregation weight falls off as ``exp(-20·acos(d·n))``
    (reference: rgbd_3d/shaders/aggregation.fsh:28-35), so a view 30° away
    contributes <3e-5 of a frontal view — aggregating every prior view (the
    reference re-rasters all 27 VBO slots per novel view,
    moderngl_renderer.py:281-315) buys nothing past the nearest few."""
    dirs = _camera_dirs(mvs)  # [B, V, 3]
    sims = np.sum(dirs[:, :j] * dirs[:, j : j + 1], axis=-1)  # [B, j]
    order = np.argsort(-sims, axis=1, kind="stable")[:, :k]
    return np.ascontiguousarray(order)


class ScenePipeline:
    """Bundles the two frameworks and the jit-compiled per-view programs.

    Hyperparameters mirror inference/sample.py defaults: fov 45, near 0.6, far 5,
    atol/rtol 0.03, erode_rgb 3 for meshing (sample.py:253-262) and erode_rgb
    passed to aggregation.
    """

    def __init__(
        self,
        framework_uncond,
        framework_cond=None,
        *,
        image_size: int = 128,
        max_views: int = 27,
        fov: float = 45.0,
        near: float = 0.6,
        far: float = 5.0,
        atol: float = 0.03,
        rtol: float = 0.03,
        erode_rgb: int = 3,
        steps_uncond: int = 1000,
        steps_cond: int = 50,
        guidance: float = 3.0,
        ssaa: int = 3,
        agg_batch_mode: str = "map",
        data_parallel: bool = False,
        max_agg_views: Optional[int] = None,
    ):
        self.fw_uncond = framework_uncond
        self.fw_cond = framework_cond
        self.image_size = image_size
        self.max_views = max_views
        self.fov = fov
        self.near = near
        self.far = far
        self.atol = atol
        self.rtol = rtol
        self.erode_rgb = erode_rgb
        self.steps_uncond = steps_uncond
        self.steps_cond = steps_cond
        self.guidance = guidance
        self.ssaa = ssaa
        # Cap the views aggregated per novel view to the K angularly nearest
        # (see select_nearest_views). None = reference-exact: every prior view.
        self.max_agg_views = max_agg_views
        assert agg_batch_mode in ("map", "vmap", "batch")
        # Multi-chip inference: shard the batch over the data mesh axis — the
        # TPU equivalent of the reference's per-GPU sampling processes
        # (reference: inference/sample.py:340-348). Aggregation must then vmap
        # over the (per-device small) batch rather than serialize it.
        self.data_parallel = data_parallel
        if data_parallel:
            from ivid_tpu.parallel import make_mesh

            self.mesh = make_mesh()
            agg_batch_mode = "vmap"
        else:
            self.mesh = None
        self.agg_batch_mode = agg_batch_mode

        # Long uncond chains run as host-chained chunk dispatches: the relayed
        # single-chip backend kills device dispatches beyond ~1-2 min (a
        # 115 s 1000-step DDPM program crashes the worker), and chunking is
        # bit-identical (samplers fold ABSOLUTE step indices into the rng).
        self._n_uncond_steps = (
            framework_uncond.schedule.timesteps
            if steps_uncond >= framework_uncond.schedule.timesteps
            else steps_uncond
        )
        chunk = samplers.default_chunk()
        self._uncond_chunk = (
            chunk if 0 < chunk < self._n_uncond_steps else self._n_uncond_steps
        )
        self._uncond_fn = jax.jit(
            partial(self._uncond_sample, num_steps=self._uncond_chunk)
        )
        tail = self._n_uncond_steps % self._uncond_chunk
        # Jitted ONCE here: wrapping per call would re-trace the full UNet
        # sampler scan (tens of seconds of remote lowering) on every batch.
        self._uncond_tail_fn = (
            jax.jit(partial(self._uncond_sample, num_steps=tail)) if tail else None
        )
        self._mesh_fn = jax.jit(self._make_meshes)
        # Aggregation re-jits per slot-bucket shape; the (expensive) guided
        # DDIM program is shape-stable and compiles once.
        self._agg_fn = jax.jit(self._agg_body)
        self._ddim_fn = jax.jit(self._guided_ddim_body)
        # Fused per-view program: aggregation + guided DDIM in ONE dispatch.
        # The relayed backend charges a ~30-40 ms round-trip floor per
        # dispatch; a 27-view sequence pays 26 of them twice over. Cost: the
        # guided UNet scan is re-lowered per slot-bucket shape (6 buckets ×
        # ~90 s one-time remote compile, persistent-cached) instead of once.
        # ``IVID_TPU_FUSED_COND_VIEW=0`` restores separate dispatches.
        self._fused_cond = (
            os.environ.get("IVID_TPU_FUSED_COND_VIEW", "1") == "1"
        )
        self._cond_view_fn = jax.jit(self._cond_view_body)
        # Chained cond views: runs of consecutive views that share one
        # slot-count S execute as ONE scan dispatch (gather + aggregation +
        # guided DDIM + mesh lift + slot write per scan step), amortizing the
        # per-dispatch relay floor AND the per-view mesh-lift dispatch. The
        # value is the max views per dispatch — each view is ~5.8 s of device
        # time at batch 16, and the relay kills dispatches past ~1-2 min, so
        # 4 (23 s) is the production ceiling. 0 disables (per-view programs).
        self._cond_chain = int(os.environ.get("IVID_TPU_COND_CHAIN", "0"))
        self._cond_chain_fn = jax.jit(self._cond_chain_body)

    # ---- jitted bodies ----

    def _uncond_sample(self, params, rng, noise, classes, i_start, *, num_steps):
        T = self.fw_uncond.schedule.timesteps
        cond = {"classes": classes} if classes is not None else None
        if self.steps_uncond >= T:
            out = samplers.ddpm_sample(
                self.fw_uncond, params, rng, noise=noise, cond=cond,
                guidance=self.guidance, num_steps=num_steps, i_start=i_start,
            )
        else:
            out = samplers.ddim_sample(
                self.fw_uncond, params, rng, noise=noise, cond=cond,
                guidance=self.guidance, steps=self.steps_uncond,
                num_steps=num_steps, i_start=i_start,
            )
        return out["samples"]

    def _run_uncond(self, params, rng, noise, classes):
        """Host-chained chunked uncond sampling (one program, traced i_start)."""
        x, i = noise, self._n_uncond_steps
        while i > 0:
            k = min(self._uncond_chunk, i)
            fn = self._uncond_fn if k == self._uncond_chunk else self._uncond_tail_fn
            x = fn(params, rng, x, classes, jnp.int32(i))
            i -= k
        return x

    def _make_meshes(self, rgbd01, modelview):
        """Batched depth→mesh lift (reference: sample.py:128-139)."""

        def one(x, mv):
            return geom.depth_to_mesh(
                geom.linearize_depth(x[..., 3:], self.near, self.far),
                padding="frustum", fov=self.fov, modelview=mv,
                atol=self.atol, rtol=self.rtol, erode_rgb=self.erode_rgb,
                cal_normal=True,
            )

        return jax.vmap(one)(rgbd01, modelview)

    def _agg_body(self, meshes, colors, valid, modelview):
        """Batched condition aggregation (per slot-bucket program).

        ``map`` (single-chip default) runs samples' slot rasters sequentially
        via ``lax.map`` — the round-4 on-chip A/B measured it beating the
        grouped launch at every group size (47.4 vs 50.6 ms/batch-slot on
        live meshes, BENCH_r04.json). ``batch`` is the grouped alternative:
        GROUPS of samples' slots per dense launch (`aggregate_conditions_batch`),
        chunked by ``IVID_TPU_AGG_GROUP`` to bound raster working memory
        (plane tables + framebuffers ≈ 8 MB/slot at 384²; a fully vmapped
        batch of 10 through the FRAGMENT path OOM-crashed the 16 GB chip in
        round 1). ``vmap`` is for multi-chip runs where the batch is sharded
        over the data mesh axis and per-device memory stays at a few
        samples."""

        def agg_one(m, c, mv):
            return warp_ops.aggregate_conditions(
                m, c, valid, mv, fov=self.fov, near=self.near, far=self.far,
                atol=self.atol, rtol=self.rtol, erode_rgb=self.erode_rgb,
                ssaa=self.ssaa,
            )

        if self.agg_batch_mode == "vmap":
            return jax.vmap(agg_one)(meshes, colors, modelview)
        if self.agg_batch_mode == "batch":
            b = colors.shape[0]
            group = int(os.environ.get("IVID_TPU_AGG_GROUP", "4"))
            # Largest divisor of b not exceeding the cap keeps one program.
            group = max(g for g in range(1, min(group, b) + 1) if b % g == 0)

            def agg_group(args):
                m, c, mv = args
                return warp_ops.aggregate_conditions_batch(
                    m, c, valid, mv, fov=self.fov, near=self.near,
                    far=self.far, atol=self.atol, rtol=self.rtol,
                    erode_rgb=self.erode_rgb, ssaa=self.ssaa,
                )

            regroup = jax.tree.map(
                lambda x: x.reshape((b // group, group) + x.shape[1:]),
                (meshes, colors, modelview),
            )
            out = jax.lax.map(agg_group, regroup)
            return jax.tree.map(
                lambda x: x.reshape((b,) + x.shape[2:]), out
            )
        return jax.lax.map(lambda a: agg_one(*a), (meshes, colors, modelview))

    def _guided_ddim_body(self, params, rng, agg, classes):
        """Guided DDIM completion — ONE compiled program reused by every view
        (separate from aggregation, whose shape varies with the slot bucket;
        keeping the UNet scan out of the per-bucket programs avoids recompiling
        the expensive part six times)."""
        color2 = agg["color"] * 2 - 1
        depth2 = agg["depth"] * 2 - 1
        cond = {
            "y": jnp.concatenate([color2, depth2], axis=-1),
            "mask": agg["mask"],
            "mask_rgb": agg["mask_rgb"],
        }
        if classes is not None:
            cond["classes"] = classes
        edits = PredX0Edits(
            replace_rgb=(0.1, color2, agg["mask_rgb"]),
            replace_depth=(0.2, depth2, agg["mask"]),
            constrain_depth=(0.5, agg["depth_convex"] * 2 - 1),
        )
        out = samplers.ddim_sample(
            self.fw_cond, params, rng,
            num=agg["color"].shape[0], image_size=self.image_size,
            cond=cond, guidance=self.guidance, steps=self.steps_cond, edits=edits,
        )
        return out["samples"]

    def _cond_view_body(self, params, rng, meshes, colors, valid, modelview, classes):
        agg = self._agg_body(meshes, colors, valid, modelview)
        samples = self._guided_ddim_body(params, rng, agg, classes)
        # Only the condition record sample_batch keeps travels out of the
        # fused program; the full agg dict (masks, convex depth) stays
        # device-internal.
        return samples, {"color": agg["color"], "depth": agg["depth"]}

    def _cond_chain_body(
        self, params, state_meshes, state_colors, keys, idxs, valids, mvs,
        slots, classes,
    ):
        """K chained cond views in one program (see ``_cond_chain`` note).

        Per scan step: gather the S conditioning slots (``idxs`` [K, B, S] —
        prefix ``arange`` below the nearest-view cap, per-sample nearest-K
        above it), aggregate, run guided DDIM, lift the completed view to a
        mesh, and write it into slot ``slots[k]`` of the carried scene state.
        RNG keys are presplit by the host driver in the exact per-view order,
        so chained and per-view sampling draw identical noise."""

        def step(carry, xs):
            sm, sc = carry
            key, idx, valid, mv, slot = xs
            take = lambda a: jax.vmap(lambda s_, i: s_[i])(a, idx)
            meshes_j = jax.tree.map(take, sm)
            colors_j = take(sc)
            agg = self._agg_body(meshes_j, colors_j, valid, mv)
            x = self._guided_ddim_body(params, key, agg, classes)
            rgbd01 = x * 0.5 + 0.5
            mesh = self._make_meshes(rgbd01, mv)
            sm = jax.tree.map(
                lambda acc, new: acc.at[:, slot].set(new), sm, mesh
            )
            sc = sc.at[:, slot].set(rgbd01[..., :3])
            return (sm, sc), (x, agg["color"], agg["depth"])

        (sm, sc), (xs_out, cols, deps) = jax.lax.scan(
            step, (state_meshes, state_colors), (keys, idxs, valids, mvs, slots)
        )
        return sm, sc, xs_out, cols, deps

    def _cond_step(self, params, rng, meshes, colors, valid, modelview, classes):
        if self._fused_cond:
            return self._cond_view_fn(
                params, rng, meshes, colors, valid, modelview, classes
            )
        agg = self._agg_fn(meshes, colors, valid, modelview)
        samples = self._ddim_fn(params, rng, agg, classes)
        return samples, agg

    # ---- host-side drivers ----

    def init_state(self, batch: int) -> SceneState:
        s = self.image_size
        zero_depth = jnp.zeros((s, s, 1))
        proto = geom.depth_to_mesh(
            zero_depth, padding="frustum", fov=self.fov,
            modelview=jnp.eye(4), atol=self.atol, rtol=self.rtol,
            erode_rgb=self.erode_rgb, cal_normal=True,
        )
        zeros = jax.tree.map(
            lambda x: jnp.zeros((batch, self.max_views) + x.shape, x.dtype), proto
        )
        return SceneState(
            meshes=zeros,
            colors=jnp.zeros((batch, self.max_views, s, s, 3)),
            valid=np.zeros((self.max_views,), bool),
        )

    def add_view(self, state: SceneState, slot: int, rgbd01, modelview) -> SceneState:
        """Lift a completed view and write it into slot ``slot``."""
        mesh = self._mesh_fn(rgbd01, modelview)
        meshes = jax.tree.map(
            lambda acc, new: acc.at[:, slot].set(new), state.meshes, mesh
        )
        colors = state.colors.at[:, slot].set(rgbd01[..., :3])
        valid = state.valid.copy()
        valid[slot] = True
        return SceneState(meshes=meshes, colors=colors, valid=valid)

    def sample_batch(
        self,
        params_uncond,
        params_cond,
        rng: jax.Array,
        modelviews,
        *,
        batch: int,
        classes: Optional[jnp.ndarray] = None,
        noise: Optional[jnp.ndarray] = None,
    ):
        """Generate one batch of scenes over a viewset.

        ``modelviews``: [V, 4, 4] (shared) or [B, V, 4, 4] (per sample).
        Returns (state, samples [B, V, s, s, 4] in [-1,1], conds dict or None).
        """
        s = self.image_size
        mvs_host = np.asarray(modelviews, np.float32)
        if mvs_host.ndim == 3:
            mvs_host = np.broadcast_to(mvs_host[None], (batch,) + mvs_host.shape)
        mvs = jnp.asarray(mvs_host)
        n_views = mvs.shape[1]

        rng, r0 = jax.random.split(rng)
        if noise is None:
            rng, rn = jax.random.split(rng)
            noise = jax.random.normal(rn, (batch, s, s, 4))
        if self.mesh is not None:
            from ivid_tpu.parallel import batch_sharding

            shard = lambda x: jax.device_put(
                x, batch_sharding(self.mesh, np.ndim(x))
            )
            noise = shard(noise)
            mvs = shard(mvs)
            if classes is not None:
                classes = shard(classes)
        x0 = self._run_uncond(params_uncond, r0, noise, classes)
        samples = [x0]
        conds = {"color": [], "depth": []}

        state = self.init_state(batch)
        state = self.add_view(state, 0, x0 * 0.5 + 0.5, mvs[:, 0])

        # mvs_host was captured before sharding: device_get on a data-sharded
        # mvs is not fully addressable on multi-host meshes.
        cap = self.max_agg_views

        def view_spec(j):
            """(S, idx [B, S], valid [S]) — view ``j``'s conditioning slots."""
            if cap is not None and j > cap:
                return (
                    cap,
                    select_nearest_views(mvs_host, j, cap),
                    np.ones((cap,), bool),
                )
            S = _slot_bucket(j, self.max_views)
            return (
                S,
                np.broadcast_to(np.arange(S), (batch, S)),
                np.arange(S) < j,
            )

        if self._cond_chain > 1:
            j = 1
            while j < n_views:
                S = view_spec(j)[0]
                run = [j]
                while (
                    len(run) < self._cond_chain
                    and run[-1] + 1 < n_views
                    and view_spec(run[-1] + 1)[0] == S
                ):
                    run.append(run[-1] + 1)
                keys = []
                for _ in run:
                    rng, rj = jax.random.split(rng)
                    keys.append(rj)
                specs = [view_spec(jj) for jj in run]
                sm, sc, xs_out, cols, deps = self._cond_chain_fn(
                    params_cond, state.meshes, state.colors,
                    jnp.stack(keys),
                    jnp.asarray(np.stack([s[1] for s in specs])),
                    jnp.asarray(np.stack([s[2] for s in specs])),
                    jnp.swapaxes(mvs[:, run[0] : run[-1] + 1], 0, 1),
                    jnp.asarray(np.asarray(run, np.int32)),
                    classes,
                )
                valid_h = state.valid.copy()
                valid_h[run] = True
                state = SceneState(meshes=sm, colors=sc, valid=valid_h)
                for k in range(len(run)):
                    samples.append(xs_out[k])
                    conds["color"].append(cols[k] * 2 - 1)
                    conds["depth"].append(deps[k] * 2 - 1)
                j = run[-1] + 1
            samples = jnp.stack(samples, axis=1)
            conds_out = (
                {k: jnp.stack(v, axis=1) for k, v in conds.items()}
                if conds["color"]
                else None
            )
            return state, samples, conds_out

        for j in range(1, n_views):
            rng, rj = jax.random.split(rng)
            if cap is not None and j > cap:
                # Gather the K angularly-nearest prior slots per sample (the
                # far ones carry exp(-20·angle) ≈ 0 aggregation weight).
                idx = jnp.asarray(select_nearest_views(mvs_host, j, cap))
                take = lambda x: jax.vmap(lambda a, i: a[i])(x, idx)
                meshes_j = jax.tree.map(take, state.meshes)
                colors_j = take(state.colors)
                valid_j = jnp.ones((cap,), bool)
                bucket = cap
            else:
                bucket = _slot_bucket(j, self.max_views)
                sl = lambda x: x[:, :bucket]
                meshes_j = jax.tree.map(sl, state.meshes)
                colors_j = sl(state.colors)
                valid_j = jnp.asarray(state.valid[:bucket])
            del bucket  # jit specializes on the sliced shapes directly
            xj, agg = self._cond_step(
                params_cond, rj,
                meshes_j, colors_j, valid_j, mvs[:, j], classes,
            )
            samples.append(xj)
            conds["color"].append(agg["color"] * 2 - 1)
            conds["depth"].append(agg["depth"] * 2 - 1)
            state = self.add_view(state, j, xj * 0.5 + 0.5, mvs[:, j])

        samples = jnp.stack(samples, axis=1)
        conds_out = (
            {k: jnp.stack(v, axis=1) for k, v in conds.items()}
            if conds["color"]
            else None
        )
        return state, samples, conds_out

    def state_to_host_scene(self, state: SceneState, sample_idx: int, n_views: int):
        """Extract one sample's meshes/colors as host-side lists for scene IO."""
        meshes, colors = [], []
        for v in range(n_views):
            mesh = jax.tree.map(lambda x: np.asarray(x[sample_idx, v]), state.meshes)
            meshes.append(mesh)
            colors.append(np.asarray(state.colors[sample_idx, v]))
        return meshes, colors
