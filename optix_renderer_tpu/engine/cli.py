"""Command-line renderer.

Replaces the reference's hardcoded app entry (src/hostCode.cpp:8-55 —
fixed scene path, fixed 1024x1024, fixed PATH renderer) with real flags
that honor the scene JSON (SURVEY §2.9 quirk 13 fixed).

Example:
  python -m optix_renderer_tpu.engine.cli --scene scenes/cornell/scene.json \\
      --renderer path --spp 64 --res 512 --out /tmp/render
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from ..scene.config import parse_scene
from .modes import DETERMINISTIC_MODES, RENDERER_NAMES, RendererType

_MODE_BY_NAME = {n.lower().replace(" ", "_"): RendererType(i) for i, n in enumerate(RENDERER_NAMES)}
_MODE_BY_NAME.update({m.name.lower(): m for m in RendererType})


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="optix_renderer_tpu", description=__doc__)
    p.add_argument("--scene", required=True, help="scene JSON (reference schema)")
    p.add_argument(
        "--renderer",
        default=None,
        help=f"one of {sorted(set(_MODE_BY_NAME))} or an int mode id; default: scene's first renderer",
    )
    p.add_argument("--spp", type=int, default=None, help="samples per pixel (default: scene spp)")
    p.add_argument("--res", type=int, default=None, help="square resolution override")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--camera", type=int, default=0, help="camera index from the scene")
    p.add_argument("--depth", type=int, default=10, help="max path depth (PATH mode)")
    p.add_argument("--out", default="out", help="output directory")
    p.add_argument("--save-gbuffers", action="store_true", help="dump all g-buffers")
    p.add_argument("--save-npy", action="store_true", help="also dump lossless .npy")
    p.add_argument("--checkpoint", default=None, help="resume accumulation from this .npz")
    p.add_argument("--save-checkpoint", default=None, help="write accumulation state here")
    p.add_argument("--denoise-ratio", action="store_true", help="RATIO mode: denoise + combine on device")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    return p


def resolve_mode(arg: str | None, scene) -> RendererType:
    if arg is None:
        return RendererType(scene.renderers[0]) if scene.renderers else RendererType.PATH
    try:
        return RendererType(int(arg))
    except ValueError:
        key = arg.lower().replace("-", "_")
        if key not in _MODE_BY_NAME:
            raise SystemExit(f"unknown renderer {arg!r}; choose from {sorted(set(_MODE_BY_NAME))}")
        return _MODE_BY_NAME[key]


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ..postprocess.io import save_npy, save_png
    from .renderer import Renderer

    scene = parse_scene(args.scene)
    mode = resolve_mode(args.renderer, scene)
    width = args.width or args.res or scene.img_width
    height = args.height or args.res or scene.img_height
    spp = args.spp if args.spp is not None else scene.spp
    if mode in DETERMINISTIC_MODES:
        spp = 1

    print(f"[optix_renderer_tpu] scene={args.scene} mode={mode.name} "
          f"{width}x{height} spp={spp} depth={args.depth}")

    r = Renderer(scene, width=width, height=height, mode=mode, path_depth=args.depth)
    if args.camera:
        r.set_camera(scene.cameras[args.camera])
    if args.checkpoint:
        r.load_checkpoint(args.checkpoint)
        print(f"  resumed at accum_id={int(r.state.accum_id)}")

    t0 = time.perf_counter()
    r.render(spp)
    img = r.image()
    dt = time.perf_counter() - t0
    rays = width * height * spp
    print(f"  rendered {spp} frame(s) in {dt:.2f}s "
          f"({rays / dt / 1e6:.1f} Mprimary-rays/s, {spp / dt:.2f} spp/s)")

    os.makedirs(args.out, exist_ok=True)
    name = mode.name.lower()
    save_png(os.path.join(args.out, f"{name}.png"), img)
    if args.save_npy:
        save_npy(os.path.join(args.out, f"{name}.npy"), img)

    if args.save_gbuffers and r.gbuffers is not None:
        gb = r.gbuffers
        for field, arr in [
            ("position", gb.position),
            ("normal", np.asarray(gb.normal) * 0.5 + 0.5),
            ("albedo", gb.albedo),
            ("alpha", gb.alpha),
            ("material_id", gb.material_id),
        ]:
            save_png(os.path.join(args.out, f"gbuffer_{field}.png"), np.asarray(arr), apply_gamma=False)
            if args.save_npy:
                save_npy(os.path.join(args.out, f"gbuffer_{field}.npy"), np.asarray(arr))

    if mode == RendererType.RATIO and r.aux:
        import jax.numpy as jnp

        from ..postprocess.denoise import atrous_denoise, ratio_combine

        for k, v in r.aux.items():
            if k.startswith("sto") or k == "ltc":
                save_png(os.path.join(args.out, f"{k}.png"), np.asarray(v))
        if args.denoise_ratio:
            gb = r.gbuffers
            d = atrous_denoise(jnp.asarray(r.aux["sto_direct"]), gb.normal, gb.position)
            n = atrous_denoise(jnp.asarray(r.aux["sto_no_vis"]), gb.normal, gb.position)
            final = np.asarray(ratio_combine(jnp.asarray(r.aux["ltc"]), d, n))
            save_png(os.path.join(args.out, "ratio_final.png"), final)
            if args.save_npy:
                save_npy(os.path.join(args.out, "ratio_final.npy"), final)

    if args.save_checkpoint:
        r.save_checkpoint(args.save_checkpoint)
        print(f"  checkpoint -> {args.save_checkpoint}")

    manifest = {
        "scene": os.path.abspath(args.scene),
        "mode": mode.name,
        "width": width,
        "height": height,
        "spp": int(r.state.accum_id),
        "seconds": dt,
    }
    with open(os.path.join(args.out, "render.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"  outputs -> {args.out}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
