#!/usr/bin/env python
"""CPU-mesh scaling table (VERDICT r2 #8): dist.scaling over 1/2/4/8
virtual CPU devices.  The 2-vCPU host makes the virtual devices share
cores, so efficiency here validates the machinery and the harness, not ICI
scaling (BASELINE.md's >=85%-to-2-hosts north star needs real hardware;
tests/test_multiprocess.py covers the multi-process execution path).

Writes results_tpu_r3/scaling_cpu.{json,md}.
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from wire_tpu.dist import scaling as SC
    from wire_tpu.nn import get_inr
    from wire_tpu.signals import coords as C, image as I
    from wire_tpu.train.trainer import FitConfig

    H = W = 128
    im = I.synthetic_image(H, W, 3, seed=0)
    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=128, hidden_layers=2,
                    first_omega0=7.0, hidden_omega0=7.0, scale=8.0)
    params = model.init(jax.random.key(0))
    cfg = FitConfig(learning_rate=5e-3, niters=40, maxpoints=H * W)
    res = SC.measure_scaling(model, params, C.grid2d(H, W),
                             im.reshape(-1, 3), cfg,
                             device_counts=[1, 2, 4, 8])
    rows = SC.efficiency_table(res)
    outdir = "results_tpu_r3"
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "scaling_cpu.json"), "w") as f:
        json.dump({str(nd): {"coords_per_s": cps, "efficiency": eff}
                   for nd, cps, eff in rows}, f, indent=1)
    lines = ["# CPU-mesh scaling (8 virtual devices on a 2-vCPU host)",
             "",
             "Machinery/harness validation; virtual devices share cores so",
             "efficiency is not an ICI measurement (see module docstring).",
             "",
             "| devices | coords/s | efficiency vs linear |",
             "|---|---|---|"]
    for nd, cps, eff in rows:
        lines.append(f"| {nd} | {cps:.3e} | {eff:.1%} |")
    with open(os.path.join(outdir, "scaling_cpu.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    for nd, cps, eff in rows:
        print(nd, f"{cps:.3e}", f"{eff:.1%}")


if __name__ == "__main__":
    main()
