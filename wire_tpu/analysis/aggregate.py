"""Cross-run aggregation — the rebuild of _aggregate_results.py: collect
metrics.mat files from a set of run folders into one markdown table plus a
montage image of the reconstructions.

Unlike the reference (hardcoded label->folder map, _aggregate_results.py:12-19),
runs are discovered from the filesystem or given explicitly.
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def collect_runs(root):
    """Find run folders (containing metrics.mat) under root."""
    runs = {}
    for m in sorted(glob.glob(os.path.join(root, "*", "metrics.mat"))):
        runs[os.path.basename(os.path.dirname(m))] = os.path.dirname(m)
    return runs


def aggregate(runs, out_dir):
    """runs: {label: folder}; writes Agg_results.md and Output_img.png."""
    import pandas as pd
    from scipy import io
    os.makedirs(out_dir, exist_ok=True)

    rows = {}
    recs = []
    labels = []
    for label, folder in runs.items():
        mpath = os.path.join(folder, "metrics.mat")
        mat = io.loadmat(mpath)
        names = [k for k in mat if not k.startswith("__")]
        vals = mat[names[0]][0, 0]
        row = {}
        for key in vals.dtype.names:
            v = np.asarray(vals[key])
            row[key] = v.ravel()[0] if v.size == 1 else v.ravel().tolist()
        rows[label] = row
        ipath = os.path.join(folder, "info.mat")
        if os.path.exists(ipath):
            imat = io.loadmat(ipath)
            inames = [k for k in imat if not k.startswith("__")]
            rec = np.asarray(imat[inames[0]][0, 0]["rec"])
            recs.append(rec)
            labels.append(label)

    df = pd.DataFrame(rows).T
    df.to_markdown(os.path.join(out_dir, "Agg_results.md"), floatfmt=".3f")

    if recs:
        from wire_tpu.signals.image import build_montage
        gray = [r.mean(-1) if r.ndim == 3 else r for r in recs]
        H = min(g.shape[0] for g in gray)
        W = min(g.shape[1] for g in gray)
        stack = np.stack([g[:H, :W] for g in gray])
        montage = build_montage(stack)
        import matplotlib.pyplot as plt
        plt.imsave(os.path.join(out_dir, "Output_img.png"),
                   np.clip(montage, 0, 1), cmap="gray")
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True,
                   help="directory whose subfolders are runs")
    p.add_argument("--out", default=None)
    a = p.parse_args(argv)
    runs = collect_runs(a.root)
    aggregate(runs, a.out or a.root)


if __name__ == "__main__":
    main()
