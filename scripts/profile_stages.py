"""Stage-level timing of the inference pipeline on the real chip
(scan-slope method).  Ablations: backbone / whole-projection+HDN heads /
JLN planes / JLN heads+decode / full model."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def slope(run, args, n1=2, n2=10):
    import jax
    import jax.numpy as jnp

    def timed(n):
        import functools

        @jax.jit
        def wrapped(a):
            def body(c, _):
                out = run(jax.tree.map(lambda x: x + c * 1e-30, a))
                ss = (jnp.sum(out) * 1e-30).astype(jnp.float32)
                return ss, ss

            _, o = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return o

        np.asarray(wrapped(args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(wrapped(args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(n2) - timed(n1)) / (n2 - n1)


def main():
    import jax
    import jax.numpy as jnp

    stages = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None

    def want(tag):
        return stages is None or tag in stages

    from faster_voxelpose_tpu.config import load_config
    from faster_voxelpose_tpu.geometry.example_rigs import dome_rig
    from faster_voxelpose_tpu.models.faster_voxelpose import build_model
    from faster_voxelpose_tpu.models.hdn import HumanDetectionNet
    from faster_voxelpose_tpu.models.projection import (
        compute_crop_origin,
        make_projection_geometry,
        project_individual_planes_pallas,
        project_whole_batch,
    )
    from faster_voxelpose_tpu.ops.pallas_sampling import pack_heatmaps
    from faster_voxelpose_tpu.ops.sampling import build_quad_table

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs/panoptic/jln64.yaml")
    )
    cfg.CAPTURE_SPEC.MIN_SCORE = -1.0
    cfg.NETWORK.COMPUTE_DTYPE = "float32"
    cfg.NETWORK.SAMPLING_BACKEND = "pallas"

    V = cfg.DATASET.CAMERA_NUM
    W, H = cfg.DATASET.HEATMAP_SIZE
    J = cfg.DATASET.NUM_JOINTS
    K = cfg.CAPTURE_SPEC.MAX_PEOPLE
    rng = np.random.RandomState(0)
    heatmaps = (rng.rand(1, V, H, W, J) * 0.5).astype(np.float32)
    cams = dome_rig(1, V)
    hm_d = jax.device_put(jnp.asarray(heatmaps))
    cams_d = jax.device_put(jnp.asarray(cams))

    model = build_model(cfg)
    geom = model.geom
    spec = model.sampling_spec
    variables = None
    if stages is None or stages & {"3", "6"}:
        # full-model init compiles the whole forward — only pay it when a
        # stage actually needs parameters
        variables = model.init(jax.random.PRNGKey(0), heatmaps, cams, train=False)
    print("spec:", spec, file=sys.stderr)

    if want("0"):
        from faster_voxelpose_tpu.models.resnet import build_backbone

        cfg_b = load_config(
            os.path.join(
                os.path.dirname(__file__), "..", "configs/panoptic/jln64.yaml"
            )
        )  # production dtype (bf16), unlike the f32 parity cfg above
        backbone = build_backbone(cfg_b)
        iw, ih = cfg_b.DATASET.IMAGE_SIZE
        imgs = jnp.asarray(rng.rand(V, ih, iw, 3), jnp.float32)
        bvars = backbone.init(jax.random.PRNGKey(0), imgs[:1])
        t = slope(
            lambda a: backbone.apply(bvars, a, train=False, mutable=False)[
                :, 0, 0, 0
            ],
            imgs,
        )
        print(f"backbone (V={V} {ih}x{iw} ResNet+deconv, bf16): {t*1e3:6.2f} ms")

    if want("1"):
        t = slope(lambda a: jax.vmap(jax.vmap(build_quad_table))(a)[:, :, 0, 0, 0],
                  hm_d)
        print(f"quad-table build: {t*1e3:6.2f} ms")

    # 2. whole-space projection (quad path)
    def whole(a):
        quads = jax.vmap(jax.vmap(build_quad_table))(a)
        return project_whole_batch(geom, quads, cams_d)[:, 0, 0, 0, 0]

    if want("2"):
        print(f"whole-space projection (+quad build): {slope(whole, hm_d)*1e3:6.2f} ms")

    # 3. full HDN
    if want("3"):
        hdn = HumanDetectionNet(
            geom=geom, max_people=K, min_score=cfg.CAPTURE_SPEC.MIN_SCORE,
            dtype=jnp.float32,
        )
        hdn_vars = {"params": variables["params"]["hdn"],
                    "batch_stats": variables["batch_stats"]["hdn"]}

        def hdn_fn(a):
            quads = jax.vmap(jax.vmap(build_quad_table))(a)
            out = hdn.apply(hdn_vars, quads, cams_d, False, mutable=False)
            return out.proposal_centers

        print(f"HDN total (whole-proj + heads + decode): {slope(hdn_fn, hm_d)*1e3:6.2f} ms")

    # 4. JLN plane projection alone (pallas), all K valid
    centers = rng.uniform(-1200, 1200, (1, K, 3)).astype(np.float32)
    centers[..., 2] = rng.uniform(600, 1100, (1, K))
    tl, _ = compute_crop_origin(geom, jnp.asarray(centers))
    bbox = jnp.asarray(rng.uniform(0.4, 0.9, (1, K, 2)).astype(np.float32))
    valid = jnp.ones((1, K), bool)

    def planes_fn(a):
        hp = jax.vmap(lambda x: pack_heatmaps(x, spec))(a)
        xy, xz, yz = jax.vmap(
            lambda h, c, t_, b, v: project_individual_planes_pallas(
                geom, h, c, t_, b, v, spec
            )
        )(hp, cams_d, tl, bbox, valid)
        return xy[:, :, 0, 0, 0]

    if want("4"):
        print(f"JLN crop+max planes (pallas, K={K}): {slope(planes_fn, hm_d)*1e3:6.2f} ms")

    # 4b. ablation: coords-only (projection math + block transpose, no kernel)
    from faster_voxelpose_tpu.geometry.grids import project_to_norm_coords
    from faster_voxelpose_tpu.ops.pallas_sampling import tile_offsets_np

    offs = jnp.asarray(
        tile_offsets_np(tuple(geom.ind_voxels_per_axis), spec.tile), jnp.int32
    )
    s = spec.samples
    nb = offs.shape[0] // s
    fine = jnp.asarray(geom.fine_voxels_per_axis, jnp.float32)
    space = jnp.asarray(geom.space_size, jnp.float32)
    sc = jnp.asarray(geom.space_center, jnp.float32)
    step = space / (fine - 1.0)
    org = sc - space / 2.0
    rt = jnp.asarray(geom.resize_transform, jnp.float32)

    def coords_fn(tl_arg):
        def person(t_):
            pts = org + (t_[None, :] + offs).astype(jnp.float32) * step

            def pv(cam):
                norm = project_to_norm_coords(
                    pts, cam, rt, geom.ori_image_size, geom.image_size,
                    geom.heatmap_size,
                )
                return (norm + 1.0) * 0.5 * jnp.asarray([W - 1, H - 1], jnp.float32)

            pix = jax.vmap(pv)(cams_d[0])
            return pix.reshape(-1, nb, s, 2).transpose(1, 0, 3, 2)

        blocks = jax.lax.map(person, tl_arg)
        return blocks[..., 0, 0, 0]

    if want("4b"):
        print(f"  ablation coords+transpose only: {slope(coords_fn, tl[0])*1e3:6.2f} ms")

    # 4c. ablation: kernel-only on fixed coords
    from faster_voxelpose_tpu.ops.pallas_sampling import sample_tiles

    fixed_blocks = jax.device_put(
        jnp.asarray(
            np.concatenate(
                [
                    rng.uniform(0, W, (K * nb, V, 1, s)),
                    rng.uniform(0, H, (K * nb, V, 1, s)),
                ],
                axis=2,
            ).astype(np.float32)
        )
    )
    hp_fixed = jax.vmap(lambda x: pack_heatmaps(x, spec))(hm_d)[0]

    def kernel_fn(c):
        return sample_tiles(hp_fixed, c, spec)[..., 0]

    if want("4c"):
        print(f"  ablation kernel only (K={K}): {slope(kernel_fn, fixed_blocks)*1e3:6.2f} ms")

    # 4e/4f/4g. realistic-coords kernel-only / epilogue-only / path stats
    if stages is not None and stages & {"4e", "4f", "4g", "4h", "4i"}:
        from faster_voxelpose_tpu.models.projection import crop_axis_masks
        from faster_voxelpose_tpu.ops.pallas_sampling import (
            compute_window_flags, tiles_to_cube,
        )

        vx, vy, vz = geom.ind_voxels_per_axis
        tx, ty, tz = spec.tile
        ntx, nty, ntz = vx // tx, vy // ty, vz // tz
        # realistic blocked coords for all K people (same math as
        # project_individual_planes_pallas)
        def person_blocks(t_):
            pts = org + (t_[None, :] + offs).astype(jnp.float32) * step

            def pv(cam):
                norm = project_to_norm_coords(
                    pts, cam, rt, geom.ori_image_size, geom.image_size,
                    geom.heatmap_size,
                )
                return (norm + 1.0) * 0.5 * jnp.asarray(
                    [W - 1, H - 1], jnp.float32
                )

            pix = jax.vmap(pv)(cams_d[0])
            return pix.reshape(-1, nb, s, 2).transpose(1, 0, 3, 2)

        blocks_real = np.asarray(
            jax.jit(lambda t_: jax.lax.map(person_blocks, t_))(tl[0])
        ).reshape(K * nb, V, 2, s)
        mx, my, mz = jax.vmap(lambda t_, bb: crop_axis_masks(geom, t_, bb))(
            tl[0], bbox[0]
        )
        lxm = np.asarray(mx).reshape(K, ntx, tx).any(-1)
        lym = np.asarray(my).reshape(K, nty, ty).any(-1)
        lzm = np.asarray(mz).reshape(K, ntz, tz).any(-1)
        live = (
            lxm[:, :, None, None] & lym[:, None, :, None]
            & lzm[:, None, None, :]
        ).reshape(K * nb)
        bvalid_real = jnp.asarray(live.astype(np.int32))
        blocks_real_d = jax.device_put(jnp.asarray(blocks_real))

        if want("4g"):
            flags = np.asarray(
                jax.jit(lambda c: compute_window_flags(c, spec))(blocks_real_d)
            )
            fastf = ((flags[:, :, 0] >> 24) > 0)[live].mean()
            print(
                f"  stats: live blocks {live.mean()*100:.1f}%, fast-path "
                f"(per live tile-view) {fastf*100:.1f}%"
            )

        if want("4e"):
            def kernel_real(c):
                return sample_tiles(hp_fixed, c, spec, valid=bvalid_real)[..., 0]

            print(
                f"  ablation kernel only, realistic coords+valid: "
                f"{slope(kernel_real, blocks_real_d)*1e3:6.2f} ms"
            )

        if want("4h"):
            # view scaling: per-view work vs per-block overhead
            import dataclasses as _dc

            for nv in (1, 2, 5):
                spec_v = _dc.replace(spec, n_views=nv)
                hp_v = hp_fixed[:, :nv]
                blocks_v = jax.device_put(
                    jnp.asarray(blocks_real[:, :nv])
                )

                def kernel_v(c, spec_v=spec_v, hp_v=hp_v):
                    return sample_tiles(
                        hp_v, c, spec_v, valid=bvalid_real
                    )[..., 0]

                print(
                    f"  kernel only V={nv}: "
                    f"{slope(kernel_v, blocks_v)*1e3:6.2f} ms"
                )

        if want("4i"):
            # planes-partials kernel, realistic coords (full fast config)
            mask_rand = jnp.asarray(
                (rng.rand(K * nb, s) > 0.4).astype(np.float32)
            )

            def kernel_pl(c):
                pxy, pxz, pyz = sample_tiles(
                    hp_fixed, c, spec, valid=bvalid_real, mask=mask_rand,
                    out_dtype=jnp.bfloat16, emit_planes=True,
                )
                return (
                    pxy[..., 0].astype(jnp.float32)
                    + pxz[..., 0].astype(jnp.float32)
                    + pyz[..., 0].astype(jnp.float32)
                )

            print(
                f"  kernel planes-partials, realistic: "
                f"{slope(kernel_pl, blocks_real_d)*1e3:6.2f} ms"
            )

        if want("4f"):
            vals_fixed = jax.device_put(
                jnp.asarray(
                    rng.rand(K * nb, spec.jp_total, s).astype(np.float32)
                )
            )
            mxd, myd, mzd = (jnp.asarray(np.asarray(m)) for m in (mx, my, mz))

            def epilogue_fn(vals):
                v8 = vals.reshape(K, ntx, nty, ntz, spec.jp_total, tx, ty, tz)
                v8 = v8 * mxd.reshape(K, ntx, 1, 1, 1, tx, 1, 1)
                v8 = v8 * myd.reshape(K, 1, nty, 1, 1, 1, ty, 1)
                v8 = v8 * mzd.reshape(K, 1, 1, ntz, 1, 1, 1, tz)

                def plane(maxed, na, nb_, ta, tb):
                    p = maxed.transpose(0, 1, 4, 2, 5, 3)
                    return p.reshape(K, na * ta, nb_ * tb, spec.jp_total)[..., :J]

                pxy = plane(jnp.max(v8, axis=(3, 7)), ntx, nty, tx, ty)
                pxz = plane(jnp.max(v8, axis=(2, 6)), ntx, ntz, tx, tz)
                pyz = plane(jnp.max(v8, axis=(1, 5)), nty, ntz, ty, tz)
                return pxy[:, 0, 0, 0] + pxz[:, 0, 0, 0] + pyz[:, 0, 0, 0]

            print(
                f"  ablation epilogue only (mask+max planes): "
                f"{slope(epilogue_fn, vals_fixed)*1e3:6.2f} ms"
            )

    # 4d. whole-space pallas
    from faster_voxelpose_tpu.models.faster_voxelpose import (
        resolve_whole_sampling_spec,
    )
    from faster_voxelpose_tpu.models.projection import project_whole_batch_pallas

    cfg.NETWORK.PALLAS_WHOLE = True
    wspec = resolve_whole_sampling_spec(cfg, spec)
    print("whole spec:", wspec, file=sys.stderr)
    if wspec is not None and want("5"):
        def whole_pallas_fn(a):
            hp = jax.vmap(lambda x: pack_heatmaps(x, spec))(a)
            return project_whole_batch_pallas(geom, hp, cams_d, wspec)[:, 0, 0, 0, 0]

        print(f"whole-space projection (pallas): {slope(whole_pallas_fn, hm_d)*1e3:6.2f} ms")

        def whole_cmp(a):
            quads = jax.vmap(jax.vmap(build_quad_table))(a)
            ref = project_whole_batch(geom, quads, cams_d)
            hp = jax.vmap(lambda x: pack_heatmaps(x, spec))(a)
            ours = project_whole_batch_pallas(geom, hp, cams_d, wspec)
            return jnp.max(jnp.abs(ref - ours))

        d = float(jax.jit(whole_cmp)(hm_d))
        print(f"whole-space pallas vs quad max|err|: {d:.2e}")

    # 7-11. individual heads (the ~5ms "heads/decode" bucket)
    if stages is not None and stages & {"7", "8", "9", "10", "11"}:
        import flax.linen as fnn

        from faster_voxelpose_tpu.models.cnns import (
            C2CNet, CenterNet, P2PNet, WeightNet,
        )
        from faster_voxelpose_tpu.ops.nms import nms2d_topk
        from faster_voxelpose_tpu.ops.soft_argmax import soft_argmax

        dt = jnp.bfloat16
        key = jax.random.PRNGKey(0)
        n3 = 3 * K  # three planes x people, batch 1

        if want("7"):
            cn = CenterNet(dtype=dt)
            cube = jnp.asarray(rng.rand(1, 80, 80, 20, J), jnp.float32)
            cvars = cn.init(key, cube, train=False)
            t = slope(lambda a: cn.apply(cvars, a, train=False)[0][..., 0], cube)
            print(f"CenterNet (80x80 BEV U-Net + heads): {t*1e3:6.2f} ms")

        if want("8"):
            c2c = C2CNet(dtype=dt)
            cols = jnp.asarray(rng.rand(K, 20, J), jnp.float32)
            cvars = c2c.init(key, cols, train=False)
            t = slope(lambda a: c2c.apply(cvars, a, train=False), cols)
            print(f"C2CNet (K={K} 1D height net): {t*1e3:6.2f} ms")
            hm2d = jnp.asarray(rng.rand(1, 80, 80), jnp.float32)
            t = slope(lambda a: nms2d_topk(a, K)[0], hm2d)
            print(f"nms2d+topk: {t*1e3:6.2f} ms")

        if want("9"):
            p2p = P2PNet(J, dtype=dt)
            planes = jnp.asarray(rng.rand(n3, 64, 64, J), jnp.float32)
            pvars = p2p.init(key, planes, train=False)
            t = slope(lambda a: p2p.apply(pvars, a, train=False), planes)
            print(f"P2PNet ({n3}x64x64 plane U-Net): {t*1e3:6.2f} ms")

        if want("10"):
            wn = WeightNet(dtype=dt)
            feats = jnp.asarray(rng.rand(n3, 64, 64, J), jnp.float32)
            wvars = wn.init(key, feats, train=False)
            t = slope(lambda a: wn.apply(wvars, a, train=False), feats)
            print(f"WeightNet ({n3*J} single-channel 64x64 convs): {t*1e3:6.2f} ms")

        if want("11"):
            feats = jnp.asarray(rng.rand(3, K, J, 64 * 64), jnp.float32)
            grids = jnp.asarray(geom.center_grids)
            t = slope(lambda a: soft_argmax(a, grids, 100.0)[0], feats)
            print(f"soft-argmax: {t*1e3:6.2f} ms")

    # 6. full model
    if want("6"):
        @jax.jit
        def full(a):
            out = model.apply(variables, a, cams_d, train=False, mutable=False)
            return out.fused_poses[..., 0]

        print(f"full model (heatmaps->poses): {slope(full, hm_d)*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
