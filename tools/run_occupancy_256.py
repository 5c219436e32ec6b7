#!/usr/bin/env python
"""Scale-driver demonstration (VERDICT round 1 #3): a real >=256^3 occupancy
fit on the TPU chip with per-epoch IoU, via apps/occupancy (the
wire_occupancy.py rebuild).  16.7M coordinates/epoch in maxpoints=2e5
chunks — the reference's protocol (wire_occupancy.py:45,136-158) at half
its 512^3 scale (the host here has 2 vCPUs; volume synthesis and the
marching-cubes export are host-bound).

Writes results + a JSON summary under results_tpu_r2/occupancy.
Usage: python tools/run_occupancy_256.py [size] [niters] [scan_segment]
(512^3 = the reference's full scale, ~134M points: use scan_segment 1-2 so
each device program stays under the tunnel's execution deadline.)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    niters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    seg = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    import dataclasses  # noqa: F401
    from wire_tpu.apps import occupancy

    t0 = time.time()
    rdir = "results_tpu_r2" if size == 256 else f"results_tpu_r2/s{size}"
    out = occupancy.run("wire", size=size, niters=niters,
                        results_dir=rdir, maxpoints=int(2e5),
                        scan_segment=seg,
                        checkpoint_path=f"/tmp/occ{size}.ckpt",
                        checkpoint_every=10 if size >= 512 else 1)
    wall = time.time() - t0
    res = out["result"]
    summary = {
        "size": size,
        "niters": niters,
        "npoints": size ** 3,
        "best_iou": out["iou"],
        "psnr_db": out["psnr"],
        "fit_wall_s": round(res.wall_time_s, 1),
        "total_wall_s": round(wall, 1),
        "coords_per_s": round(niters * size ** 3 / res.wall_time_s, 1),
        "mesh_file": out["mesh"],
    }
    path = os.path.join("results_tpu_r2", "occupancy",
                        f"summary_{size}.json" if size != 256 else "summary.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
