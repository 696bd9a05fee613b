"""Headless CLI: render an OBJ (+ optional PNG texture) to a PNG image.

The reference's only entry point is a Unity MonoBehaviour wired in a scene
(``RaytracingMeshDrawer.cs``); this is the framework-native equivalent:

    python -m unitysimpleraytracing_tpu.cli scene.obj out.png \
        --texture tex.png --width 640 --height 480 --eye 3 2 4
"""
from __future__ import annotations

import argparse
import time


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="TPU LBVH raytracer")
    ap.add_argument("obj")
    ap.add_argument("out")
    ap.add_argument("--texture", default=None)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--fov", type=float, default=60.0)
    ap.add_argument("--eye", type=float, nargs=3, default=None)
    ap.add_argument("--target", type=float, nargs=3, default=(0.0, 0.0, 0.0))
    ap.add_argument("--background", type=float, nargs=3, default=(0.12, 0.12, 0.15))
    ap.add_argument("--flip-x", action="store_true", help="Unity-style OBJ import")
    ap.add_argument("--shadows", action="store_true", help="shadow-ray pass")
    ap.add_argument(
        "--gizmo", action="store_true",
        help="overlay BVH internal-node AABB wireframes (debug oracle)",
    )
    ap.add_argument(
        "--platform", default="auto", choices=["auto", "cpu", "tpu"],
        help="force the JAX platform (env vars may be overridden by the "
        "environment; only an in-process config update is reliable)",
    )
    args = ap.parse_args(argv)

    if args.platform != "auto":
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    import unitysimpleraytracing_tpu as rt
    from unitysimpleraytracing_tpu.io.png import write_png

    t0 = time.perf_counter()
    mesh = rt.load_obj(args.obj, flip_x=args.flip_x)
    print(f"loaded {mesh.num_triangles} triangles in {time.perf_counter()-t0:.2f}s")

    scene = rt.build_scene(mesh)
    t0 = time.perf_counter()
    bvh = rt.build_bvh(scene)
    bvh.node_aabb_min.block_until_ready()
    print(f"BVH built in {time.perf_counter()-t0:.3f}s")

    if args.eye is None:
        lo = mesh.positions.min(axis=(0, 1))
        hi = mesh.positions.max(axis=(0, 1))
        center = (lo + hi) / 2
        diag = float(np.linalg.norm(hi - lo))
        eye = center + np.array([0.8, 0.6, 1.2]) * diag
        target = center
    else:
        eye, target = args.eye, args.target
    cam = rt.make_camera(
        eye=eye, target=target, width=args.width, height=args.height, fov_deg=args.fov
    )
    tex = rt.load_texture(args.texture) if args.texture else rt.solid_texture((0.8, 0.8, 0.8, 1.0))

    t0 = time.perf_counter()
    frame = rt.render_frame(
        scene, bvh, cam, tex, np.asarray(args.background, np.float32),
        shadows=args.shadows,
    )
    frame.block_until_ready()
    dt = time.perf_counter() - t0
    mrays = args.width * args.height / dt / 1e6
    print(f"rendered {args.width}x{args.height} in {dt:.3f}s ({mrays:.2f} Mrays/s, cold)")

    img = rt.frame_to_image(frame)
    if args.gizmo:
        from unitysimpleraytracing_tpu.utils.visualize import draw_aabbs

        over = draw_aabbs(
            np.asarray(frame), cam,
            np.asarray(bvh.node_aabb_min)[: bvh.num_internal],
            np.asarray(bvh.node_aabb_max)[: bvh.num_internal],
        )
        img = over[::-1]
    write_png(args.out, img)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
