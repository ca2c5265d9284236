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

# One-time: materialize the reference's FULL 12-mesh bunny ladder
# (`benchmarks_v2/`: bunny_3510 ... bunny_10785024) as OBJ files —
# decimated rows via bench.decimate_to, larger rows via subdivide_to.
# Skipped when already present.
python - <<'EOF'
import os
from bench import decimate_to, subdivide_to
from voxtpu.mesh.mesh import Mesh
from voxtpu.mesh.obj_io import export_mesh, import_mesh

base = import_mesh("/root/reference/assets/bunny.obj")
LADDER = (3510, 7020, 14042, 28086, 168516, 337032, 674064, 1348128,
          2696256, 5392128, 10785024)
for faces in LADDER:
    path = f"/tmp/bunny_{faces}.obj"
    if os.path.exists(path):
        continue
    fn = decimate_to if faces < base.faces.shape[0] else subdivide_to
    c, f = fn(base.coords, base.faces, faces)
    export_mesh(path, Mesh(name=f"bunny_{faces}", coords=c, faces=f,
                           faces_normals=f))
    print("wrote", path, f.shape[0])
EOF

# Face-scaling ladder: pallas vox+jfa+csg at 32-256 for every rung the
# big-mesh sections below don't already cover (the kernel is
# face-count-independent — this is the curve that shows it).
timeout 7200 python scripts/benchmarks.py --in-process \
    --meshes /tmp/bunny_3510.obj /tmp/bunny_7020.obj \
             /tmp/bunny_14042.obj /tmp/bunny_28086.obj \
             /tmp/bunny_168516.obj /tmp/bunny_337032.obj \
             /tmp/bunny_674064.obj /tmp/bunny_2696256.obj \
             /tmp/bunny_5392128.obj \
    --types 2 --minsize 32 --maxsize 256 --niter 3 --output benchmarks

# 1.35M-face mesh: pallas vox at 1024-2048 (SDF only to 512, as before).
timeout 4800 python scripts/benchmarks.py --in-process \
    --meshes /tmp/bunny_1348128.obj --types 2 \
    --minsize 1024 --maxsize 2048 --no-sdf --niter 3 --output benchmarks

# 10.8M-face mesh row (reference's largest): pallas vox @256.
timeout 4800 python scripts/benchmarks.py --in-process \
    --meshes /tmp/bunny_10785024.obj --types 2 \
    --minsize 256 --maxsize 256 --no-sdf --niter 3 --output benchmarks

# xla column at small N, standard meshes (native + reference-oracle
# columns are host-side — they run without the tunnel and are refreshed
# separately: `--types 0 3 --device cpu`).
timeout 4800 python scripts/benchmarks.py --in-process \
    --types 1 --minsize 32 --maxsize 128 --niter 3 \
    --output benchmarks

# Regenerate plots from whatever CSVs now exist (per-mesh folders).
for d in benchmarks/*/; do
    timeout 600 python scripts/plot_benchmarks.py "$d" || true
done
