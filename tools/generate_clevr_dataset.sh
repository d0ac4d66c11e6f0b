#!/usr/bin/env bash
# Driver for CLEVR-Infinite-style dataset synthesis
# (rebuild of reference clevr_generation/blender_generation.sh):
# renders N scenes with Blender, then converts EXR -> png + npy.
set -euo pipefail
OUT=${1:-dataset/clevr_infinite}
SCENES=${2:-10}
GRID=${3:-50}
for s in $(seq 1 "$SCENES"); do
  scene_dir=$(printf "%s/diffuse_scene_%04d" "$OUT" "$s")
  blender -b -P "$(dirname "$0")/blender_clevr_generation.py" -- \
    --out "$scene_dir" --grid "$GRID" --seed "$s"
  python "$(dirname "$0")/convert_exr.py" "$scene_dir"
done
