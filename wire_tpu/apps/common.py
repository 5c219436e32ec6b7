"""Shared plumbing for the task drivers: input loading (real file or
procedural stand-in), model construction from a preset, artifact writing."""
from __future__ import annotations

import argparse
import os

import numpy as np

from wire_tpu.nn import get_inr
from wire_tpu.signals import image as I
from wire_tpu.train import artifacts as A
from wire_tpu.train.presets import ExperimentConfig, get_config


def base_parser(description):
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config_name", type=str, required=True,
                   help="preset name from wire_tpu.train.presets")
    p.add_argument("--image", type=str, default=None,
                   help="input image path (default: procedural test image; "
                        "the reference's inputs live on a private cluster)")
    p.add_argument("--results_dir", type=str, default="results")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--reference_compat", action="store_true",
                   help="reproduce reference defects that affected published "
                        "numbers (mscale_HL first-layer detach)")
    p.add_argument("--mesh", type=int, default=0, metavar="N",
                   help="shard the fit over an N-device mesh (0 = "
                        "single-device)")
    return p


def mesh_from_arg(n):
    """0/None -> single-device; N -> a 1-D mesh over the first N devices."""
    if not n:
        return None
    from wire_tpu.dist import make_mesh
    return make_mesh(n)


def load_image(path, size=512, channels=3, seed=0, kind="natural"):
    if path:
        im = I.imread(path)
        if channels == 1 and im.ndim == 3:
            im = im[..., 1]
        return im.astype(np.float32)
    gen = I.natural_image if kind == "natural" else I.synthetic_image
    im = gen(size, size, channels, seed=seed)
    return im[..., 0] if channels == 1 else im


def build_model(cfg: ExperimentConfig, *, in_features, out_features, omega0,
                hidden_layers=2, hidden_features=None, sidelength=512,
                pos_encode=False, reference_compat=False):
    """Model factory wiring matching the config-driven scripts
    (bspline_image_denoise.py:95-108): posenc remaps to relu+pos_encode;
    the repIN family widens in_features (bspline_image_denoise.py:54-55)."""
    nonlin = cfg.nonlin
    if nonlin == "posenc":
        nonlin = "relu"
        pos_encode = True
    if nonlin in ("bspline_mscale_1_new", "bspline_mscale_repIN"):
        in_features = (in_features * len(cfg.scale_tensor)
                       * cfg.scaled_hidden_features)
    return get_inr(
        nonlin,
        in_features=in_features,
        out_features=out_features,
        hidden_features=(hidden_features if hidden_features is not None
                         else cfg.hidden_features),
        hidden_layers=hidden_layers,
        scaled_hidden_features=cfg.scaled_hidden_features,
        first_omega0=omega0,
        hidden_omega0=omega0,
        scale=cfg.scale,
        scale_tensor=cfg.scale_tensor,
        pos_encode=pos_encode,
        sidelength=sidelength,
        detach_split=reference_compat,
    )


def write_run_artifacts(results_dir, task_dir, run_name, mdict_entry,
                        metrics_entry):
    """info.mat / metrics.mat / metrics_table.md / Output_img.png under
    results_dir/task_dir/<unique run folder> — the reference's artifact
    layout (bspline_image_denoise.py:200-228)."""
    parent = os.path.join(results_dir, task_dir)
    os.makedirs(parent, exist_ok=True)
    folder = A.make_unique(run_name, parent)
    path = os.path.join(parent, folder)
    os.makedirs(path, exist_ok=True)
    A.save_mat(os.path.join(path, "info.mat"), {folder: mdict_entry})
    A.save_mat(os.path.join(path, "metrics.mat"), {folder: metrics_entry})
    A.tabulate_results(os.path.join(path, "metrics.mat"), path)
    if "rec" in mdict_entry:
        A.display_image(os.path.join(path, "info.mat"))
    return path
