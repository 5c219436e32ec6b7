"""Worker process for the REAL multi-process execution test
(tests/test_multiprocess.py; VERDICT r2 #3).

Each worker joins a 2-process CPU cluster via jax.distributed.initialize
(4 virtual devices per process -> one global 8-device mesh), feeds ONLY its
own coordinate/target rows through dist.multihost.feed_rows, runs the
sharded fitters, and (process 0) writes the metric trajectories to a JSON
file for comparison against the single-process 8-device run.

Usage: python multiproc_worker.py <pid> <nproc> <port> <outfile>
"""
import json
import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outfile = sys.argv[3], sys.argv[4]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4"
                               ).strip()
    os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

    import numpy as np
    from wire_tpu.dist import multihost as MH
    from wire_tpu.dist import (fit_frames_sharded, fit_operator_sharded,
                               fit_pointwise_sharded)
    from wire_tpu.nn import get_inr
    from wire_tpu.operators.forward import DownsampleOp
    from wire_tpu.signals import coords as C, image as I
    from wire_tpu.train.trainer import FitConfig

    assert MH.initialize(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc
    mesh = MH.make_global_mesh()

    H = W = 32
    spec = C.GridSpec(H, W)
    im = I.synthetic_image(H, W, 3, seed=0)          # tiny: every host CAN
    target_full = im.reshape(-1, 3)                  # synthesize it; rows
    n = H * W                                        # still feed per-process

    coords = MH.feed_rows(mesh, lambda lo, hi:
                          np.asarray(spec.rows(np.arange(lo, hi))), n)
    target = MH.feed_rows(mesh, lambda lo, hi: target_full[lo:hi], n)

    model = get_inr("wire", in_features=2, out_features=3,
                    hidden_features=32, hidden_layers=2, first_omega0=5.0,
                    hidden_omega0=5.0, scale=4.0)
    params = model.init(jax.random.key(0))
    out = {"nproc": nproc, "ndev": len(jax.devices())}

    # (a) default coordinate-DP: per-device local permutations over the
    # per-process-fed sharded rows
    cfg = FitConfig(learning_rate=5e-3, niters=20, maxpoints=n, seed=0)
    res = fit_pointwise_sharded(model, params, coords, target, cfg, mesh,
                                gt=target, track="noisy", donate=False)
    out["local_mse"] = np.asarray(res.mse_noisy).tolist()

    # (b) exact single-device trajectory mode (replicated data + shared
    # permutation stream)
    cfg_gp = FitConfig(learning_rate=5e-3, niters=20, maxpoints=n // 4,
                       seed=0)
    res_gp = fit_pointwise_sharded(model, model.init(jax.random.key(0)),
                                   spec, jax.device_put(target_full),
                                   cfg_gp, mesh, gt=target_full,
                                   track="noisy", donate=False,
                                   global_perm=True)
    out["global_mse"] = np.asarray(res_gp.mse_noisy).tolist()

    # (c) operator-sharded (VERDICT r3 #3): sharded full-grid render +
    # all_gather + replicated forward operator, crossing DCN
    op = DownsampleOp(2)
    meas = np.asarray(
        op(jax.numpy.asarray(im))).astype(np.float32)
    cfg_op = FitConfig(learning_rate=5e-3, niters=15, seed=0)
    res_op = fit_operator_sharded(
        model, model.init(jax.random.key(0)), spec.materialize(), meas, op,
        cfg_op, mesh, gt_field=im, field_shape=(H, W, 3), track="gt",
        donate=False)
    out["operator_mse"] = np.asarray(res_op.mse_noisy).tolist()
    out["operator_tracked"] = np.asarray(res_op.mse_gt).tolist()

    # (d) frames-sharded (VERDICT r3 #3): per-step frame batch split over
    # the process-spanning mesh, masked psum partial sums across DCN
    rng = np.random.RandomState(0)
    scale, nframes, bs = 2, 10, 8
    base = np.asarray(spec.materialize())
    frame_coords = np.stack([
        np.clip(base + rng.uniform(-0.05, 0.05, size=(1, 2)), -1, 1)
        for _ in range(nframes)]).astype(np.float32)
    frame_pixels = rng.rand(
        nframes, (H // scale) * (W // scale), 3).astype(np.float32)
    frame_masks = (rng.rand(*frame_pixels.shape) > 0.1).astype(np.float32)
    cfg_fr = FitConfig(learning_rate=5e-3, niters=6, lr_decay=1.0, seed=0)
    res_fr = fit_frames_sharded(
        model, model.init(jax.random.key(0)), frame_coords, frame_pixels,
        frame_masks, cfg_fr, mesh, hr_shape=(H, W, 3), scale=scale,
        batch_size=bs, donate=False)
    out["frames_mse"] = np.asarray(res_fr.mse_noisy).tolist()

    if pid == 0:
        tmp = outfile + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f)
        os.replace(tmp, outfile)
    # all processes must stay alive until the cluster work is done
    jax.effects_barrier()


if __name__ == "__main__":
    main()
