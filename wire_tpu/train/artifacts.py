"""Run artifacts: timestamped logging, unique run folders, .mat export,
markdown metric tables, and reconstruction images — the same artifact surface
the reference's L5 tooling consumes (utils.py:291-358, SURVEY.md §5).

Also provides simple parameter checkpointing (.npz of the flattened pytree,
plus optional orbax) — the capability the reference lacks (best-model kept
only in RAM, SURVEY.md §5 checkpoint row).
"""
from __future__ import annotations

import os
import re
from datetime import datetime

import numpy as np


def log(message):
    """Timestamped print (utils.py:291-292)."""
    print(f"{datetime.now()} - {message}")


def make_unique(folder_name, folder_path):
    """Append/_increment a numeric suffix until the folder is unused
    (utils.py:337-358)."""
    m = re.search(r"_(\d+)$", folder_name)
    if m:
        base, counter = folder_name[:m.start()], int(m.group(1)) + 1
    else:
        base, counter = folder_name, 1
    candidate = f"{base}_{counter}"
    while os.path.exists(os.path.join(folder_path, candidate)):
        counter += 1
        candidate = f"{base}_{counter}"
    return candidate


def save_mat(path, data):
    from scipy import io
    io.savemat(path, data)


def tabulate_results(mat_file, path):
    """metrics.mat -> pandas -> metrics_table.md (utils.py:295-324)."""
    import pandas as pd
    from scipy import io
    mat = io.loadmat(mat_file)
    names = [k for k in mat if not k.startswith("__")]
    data = {}
    for key in mat[names[0]][0, 0].dtype.names:
        data[key] = []
    for n in names:
        values = mat[n][0, 0]
        for key in values.dtype.names:
            v = values[key]
            if v.size == 0:
                # e.g. an empty scale_tensor on single-scale presets
                data[key].append([])
            elif isinstance(v[0], (list, np.ndarray)) and v.size > 1:
                data[key].append(np.asarray(v[0]).tolist())
            else:
                data[key].append(np.asarray(v).ravel()[0])
    df = pd.DataFrame(data, index=names)
    df.to_markdown(os.path.join(path, "metrics_table.md"), floatfmt=".3f")


def display_image(info_mat_path):
    """Save the reconstruction stored in info.mat as Output_img.png
    (utils.py:326-335)."""
    import matplotlib.pyplot as plt
    from scipy import io
    mat = io.loadmat(info_mat_path)
    for key in mat:
        if key.startswith("__"):
            continue
        img = mat[key][0, 0]["rec"]
        out = os.path.join(os.path.dirname(info_mat_path), "Output_img.png")
        arr = np.clip(np.abs(img), 0, 1)
        if arr.ndim == 2:
            plt.imsave(out, arr, vmin=0.0, vmax=1.0, cmap="gray")
        else:
            plt.imsave(out, arr, vmin=0.0, vmax=1.0)


# ---------------------------------------------------------------------------
# Checkpointing
# ---------------------------------------------------------------------------

def save_params(path, params):
    """Flat .npz checkpoint of a parameter pytree (keys = tree paths)."""
    import jax
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(_path_str(e) for e in kp)
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def load_params(path, like):
    """Restore a .npz checkpoint into the structure of ``like``."""
    import jax
    data = np.load(path)
    leaves_paths = jax.tree_util.tree_flatten_with_path(like)
    out = []
    for kp, leaf in leaves_paths[0]:
        key = "/".join(_path_str(e) for e in kp)
        out.append(np.asarray(data[key]).reshape(np.shape(leaf)))
    return jax.tree_util.tree_unflatten(leaves_paths[1], out)


def _path_str(entry):
    import jax
    if isinstance(entry, jax.tree_util.DictKey):
        return str(entry.key)
    if isinstance(entry, jax.tree_util.SequenceKey):
        return str(entry.idx)
    return str(entry)


def save_checkpoint_orbax(path, params, step=0):
    """Orbax checkpoint (for multi-host / async use-cases; the .npz path
    covers single-host)."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params)


def load_checkpoint_orbax(path, like=None):
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            import jax
            target = jax.tree.map(
                lambda x: ocp.utils.to_shape_dtype_struct(x)
                if hasattr(ocp.utils, "to_shape_dtype_struct") else x, like)
            try:
                return ckptr.restore(os.path.abspath(path), target)
            except Exception:
                pass
        return ckptr.restore(os.path.abspath(path))
