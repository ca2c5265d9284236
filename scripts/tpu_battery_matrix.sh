#!/bin/bash
# Benchmark-matrix depth battery (VERDICT r2 missing #3): extend the
# checked-in CSVs toward reference depth — large-N vox rows for the
# 1.35M-face mesh, the 10.8M-face mesh row, and native/xla columns at
# small N. Run AFTER tpu_battery_r3.sh, in the same session if time
# allows. Output lands under benchmarks/<mesh-stem>/.
#
#   bash scripts/tpu_battery_matrix.sh 2>&1 | tee /tmp/battery_matrix.log
#
cd "$(dirname "$0")/.." || exit 1
set -x

# One-time: materialize the subdivided benchmark meshes as OBJ files
# (the CLI is file-driven; native parser reads the 10.8M-face file in
# seconds). Skipped when already present.
python - <<'EOF'
import os
from bench import subdivide_to
from voxtpu.mesh.mesh import Mesh
from voxtpu.mesh.obj_io import export_mesh, import_mesh

base = import_mesh("/root/reference/assets/bunny.obj")
for faces in (1348128, 10785024):
    path = f"/tmp/bunny_{faces}.obj"
    if os.path.exists(path):
        continue
    c, f = subdivide_to(base.coords, base.faces, faces)
    export_mesh(path, Mesh(name=f"bunny_{faces}", coords=c, faces=f,
                           faces_normals=f))
    print("wrote", path)
EOF

# 1.35M-face mesh: pallas vox at 1024-2048 (SDF only to 512, as before).
timeout 4800 python scripts/benchmarks.py \
    --meshes /tmp/bunny_1348128.obj --types 2 \
    --minsize 1024 --maxsize 2048 --no-sdf --niter 3 --output benchmarks

# 10.8M-face mesh row (reference's largest): pallas vox @256.
timeout 4800 python scripts/benchmarks.py \
    --meshes /tmp/bunny_10785024.obj --types 2 \
    --minsize 256 --maxsize 256 --no-sdf --niter 3 --output benchmarks

# xla column at small N, standard meshes (native + reference-oracle
# columns are host-side — they run without the tunnel and are refreshed
# separately: `--types 0 3 --device cpu`).
timeout 4800 python scripts/benchmarks.py \
    --types 1 --minsize 32 --maxsize 128 --niter 3 \
    --output benchmarks

# Regenerate plots from whatever CSVs now exist (per-mesh folders).
for d in benchmarks/*/; do
    timeout 600 python scripts/plot_benchmarks.py "$d" || true
done
