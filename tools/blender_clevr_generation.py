"""Blender (bpy) script: synthesize a CLEVR-Infinite-style RGB-D dataset.

Rebuild of reference clevr_generation/blender_data_generation_grid.py:
random primitives (cube/cone/cylinder/icosphere) dropped onto a ground plane
with rigid-body physics, then rendered with Cycles from a regular camera
grid; writes transforms.json (OpenGL c2w matrices) + K.npy alongside
multilayer EXR renders (convert with tools/convert_exr.py).

Run inside Blender:  blender -b -P tools/blender_clevr_generation.py -- \
    --out /data/scene_0001 --grid 50 --objects 120
Offline tooling; bpy is only importable inside Blender.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import random
import sys


def parse_args():
    argv = sys.argv[sys.argv.index("--") + 1 :] if "--" in sys.argv else []
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--grid", type=int, default=50, help="camera grid side")
    p.add_argument("--objects", type=int, default=120)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--step", type=float, default=0.81632614 * 2)
    return p.parse_args(argv)


def main() -> None:
    import bpy  # only available inside Blender
    import numpy as np

    args = parse_args()
    random.seed(args.seed)
    os.makedirs(args.out, exist_ok=True)
    scene = bpy.context.scene
    bpy.ops.wm.read_factory_settings(use_empty=True)
    scene = bpy.context.scene
    scene.render.engine = "CYCLES"
    scene.render.resolution_x = scene.render.resolution_y = args.resolution
    scene.render.image_settings.file_format = "OPEN_EXR_MULTILAYER"
    scene.view_layers[0].use_pass_z = True

    # ground plane with passive rigid body
    bpy.ops.mesh.primitive_plane_add(size=200)
    plane = bpy.context.object
    bpy.ops.rigidbody.object_add()
    plane.rigid_body.type = "PASSIVE"

    # light
    bpy.ops.object.light_add(type="SUN", location=(0, 0, 30))

    # random primitives dropped from above (reference :110-160)
    adders = [
        lambda: bpy.ops.mesh.primitive_cube_add(size=random.uniform(0.6, 1.4)),
        lambda: bpy.ops.mesh.primitive_cone_add(radius1=random.uniform(0.4, 0.9)),
        lambda: bpy.ops.mesh.primitive_cylinder_add(radius=random.uniform(0.4, 0.9)),
        lambda: bpy.ops.mesh.primitive_ico_sphere_add(radius=random.uniform(0.4, 0.9)),
    ]
    half = args.grid * args.step / 2
    for _ in range(args.objects):
        random.choice(adders)()
        obj = bpy.context.object
        obj.location = (
            random.uniform(-half, half),
            random.uniform(-half, half),
            random.uniform(1.0, 4.0),
        )
        obj.rotation_euler = [random.uniform(0, math.pi)] * 3
        bpy.ops.rigidbody.object_add()
        mat = bpy.data.materials.new("m")
        mat.use_nodes = True
        bsdf = mat.node_tree.nodes["Principled BSDF"]
        bsdf.inputs["Base Color"].default_value = (
            random.random(), random.random(), random.random(), 1.0,
        )
        obj.data.materials.append(mat)

    # bake physics so objects settle (reference :162-164)
    scene.frame_end = 60
    bpy.ops.ptcache.bake_all(bake=True)
    scene.frame_set(60)

    # camera grid, pitched down like the SGAM trajectory
    bpy.ops.object.camera_add()
    cam = bpy.context.object
    scene.camera = cam
    cam.data.angle = 2 * math.atan(args.resolution / (2 * 355.5555 * args.resolution / 256))
    # 0.3 rad about X, verbatim from the reference's camera_add
    # (blender_data_generation_grid.py:168). Blender cameras look along -Z
    # at rotation (0,0,0), so 0.3 rad = 17.2 deg OFF NADIR (near-straight
    # down at z=12 over the object field). NOT measured from horizontal:
    # radians(107.2) would point the camera 17.2 deg ABOVE the horizon and
    # render empty sky in every frame.
    pitch = 0.3

    frames = []
    for i in range(args.grid):
        for j in range(args.grid):
            cam.location = (-half + j * args.step, -half + i * args.step, 12.0)
            cam.rotation_euler = (pitch, 0.0, 0.0)
            bpy.context.view_layer.update()
            idx = i * args.grid + j
            scene.render.filepath = os.path.join(args.out, f"render_{idx:05d}.exr")
            bpy.ops.render.render(write_still=True)
            frames.append(
                {
                    "file_path": f"im_{idx:05d}.png",
                    "transform_matrix": [list(r) for r in cam.matrix_world],
                }
            )

    with open(os.path.join(args.out, "transforms.json"), "w") as f:
        json.dump({"frames": frames}, f, indent=1)
    f_px = 355.5555 * args.resolution / 256
    np.save(
        os.path.join(args.out, "K.npy"),
        np.array(
            [[f_px, 0, args.resolution / 2], [0, f_px, args.resolution / 2], [0, 0, 1]]
        ),
    )
    print(f"rendered {len(frames)} frames to {args.out}")


if __name__ == "__main__":
    main()
