#!/usr/bin/env python
"""Multi-frame SR at the reference's protocol on TPU: 512^2 image,
scale_sr=4 -> 4 shifted/rotated LR frames, 2000 epochs, WIRE — the
wire_multi_sr.py pipeline (burst synthesis with known Euclidean motion,
area downsample, warped-coordinate rendering, masked MSE, best-state
reload, griddata baseline), both with oracle registration and with
ECC-estimated registration.

Writes artifacts + a JSON summary under <outdir>/multi_sr.
Usage: python tools/run_multisr_512.py [size] [niters] [outdir=results_tpu_r3]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    niters = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    rdir = sys.argv[3] if len(sys.argv) > 3 else "results_tpu_r3"
    from wire_tpu.apps import multi_sr

    outdir = os.path.join(rdir, "multi_sr")
    os.makedirs(outdir, exist_ok=True)
    summary = {}
    for tag, use_gt in (("oracle_reg", True), ("estim_reg", False)):
        t0 = time.time()
        out = multi_sr.run("wire", results_dir=rdir,
                           size=size, niters=niters, scale_sr=4,
                           use_gt_registration=use_gt)
        summary[tag] = {
            "size": size, "niters": niters,
            "psnr_db": round(out["psnr"], 3),
            "ssim": round(out["ssim"], 4),
            "psnr_interp_baseline_db": round(out["psnr_interp"], 3),
            "fit_wall_s": round(out["result"].wall_time_s, 1),
            "total_wall_s": round(time.time() - t0, 1),
        }
        print(json.dumps({tag: summary[tag]}), flush=True)
    with open(os.path.join(outdir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
