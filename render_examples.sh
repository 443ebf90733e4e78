#!/usr/bin/env bash
# Render the example scenes to PNGs (a working replacement for the
# reference's stale render_examples.sh whose CLI flags don't exist).
set -euo pipefail
mkdir -p examples_out
for scene in cornell_box cubes crewmate_phong; do
  python -m raytracer_tpu.tools.render "scenes/${scene}.toml" \
    --spp 64 --out "examples_out/${scene}.png"
done
python -m raytracer_tpu.tools.render scenes/cornell_box.toml \
  --spp 64 --mis --out examples_out/cornell_box_mis.png
python -m raytracer_tpu.tools.render scenes/flying_unicorn.toml \
  --spp 16 --out examples_out/flying_unicorn.png
echo "wrote examples_out/"
