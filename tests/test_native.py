"""Native C++ components: marching cubes vs analytic sphere, mesh export,
rigid registration recovering a known transform."""
import os

import numpy as np
import pytest

from wire_tpu import native


def _sphere_volume(n=48, r=0.6):
    z, y, x = np.mgrid[-1:1:n * 1j, -1:1:n * 1j, -1:1:n * 1j]
    return (r - np.sqrt(x * x + y * y + z * z)).astype(np.float32)


def test_marching_cubes_sphere_area_and_volume():
    n, r = 48, 0.6
    vol = _sphere_volume(n, r)
    verts, faces = native.marching_cubes(vol, 0.0)
    assert len(verts) > 100 and len(faces) > 100
    # vertices lie on the r-sphere (voxel -> [-1,1] coords)
    pts = verts / (n - 1) * 2 - 1
    rad = np.linalg.norm(pts, axis=1)
    assert np.abs(rad - r).max() < 0.08
    # surface area approximates 4*pi*r^2
    v = pts[faces]
    cross = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    area = 0.5 * np.linalg.norm(cross, axis=1).sum()
    expected = 4 * np.pi * r * r
    assert abs(area - expected) / expected < 0.05, (area, expected)


def test_marching_cubes_watertight_sphere():
    vol = _sphere_volume(32, 0.5)
    verts, faces = native.marching_cubes(vol, 0.0)
    # closed surface: every edge appears exactly twice
    edges = {}
    for t in faces:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            key = (min(a, b), max(a, b))
            edges[key] = edges.get(key, 0) + 1
    counts = np.array(list(edges.values()))
    assert (counts == 2).all()


def test_mesh_export_formats(tmp_path):
    vol = _sphere_volume(16, 0.5)
    verts, faces = native.marching_cubes(vol, 0.0)
    obj = tmp_path / "m.obj"
    dae = tmp_path / "m.dae"
    native.export_mesh(verts, faces, str(obj))
    native.export_mesh(verts, faces, str(dae))
    txt = obj.read_text()
    assert txt.count("\nv ") + txt.startswith("v ") == len(verts)
    assert "<COLLADA" in dae.read_text()


def test_rigid_register_recovers_transform():
    import cv2
    from wire_tpu.signals import image as I
    im = I.synthetic_image(96, 96, 1, seed=0)[..., 0]
    theta = np.deg2rad(3.0)
    tx, ty = 2.5, -1.5
    M = np.array([[np.cos(theta), -np.sin(theta), tx],
                  [np.sin(theta), np.cos(theta), ty]], np.float32)
    moved = cv2.warpAffine(im, M, im.shape[::-1], flags=cv2.INTER_LINEAR)
    # cv2.warpAffine applies M in the forward convention (it inverts
    # internally): moved(x) = im(M^{-1} x).  rigid_register returns W in the
    # sampling convention im(W x) = moved(x), so W must equal M^{-1}:
    # composing W with M must give identity.
    warp = native.rigid_register(moved, im, max_iters=200)
    W3 = np.vstack([warp, [0, 0, 1]])
    M3 = np.vstack([M, [0, 0, 1]])
    comp = W3 @ M3
    assert np.abs(comp - np.eye(3)).max() < 0.2, comp
    # and the residual between im sampled at W and the moved frame is small
    h, w = im.shape
    resampled = cv2.warpAffine(im, warp, (w, h),
                               flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP)
    interior = np.abs(resampled - moved)[8:-8, 8:-8]
    assert interior.mean() < 5e-3, interior.mean()


def test_march_and_save_smoothened(tmp_path):
    from wire_tpu.signals import volume as V
    from wire_tpu.signals import image as I
    occ = I.synthetic_volume(32, seed=0)
    out = tmp_path / "occ.dae"
    verts, faces = V.march_and_save(occ, 0.5, str(out), smoothen=True)
    assert out.exists() and len(verts) > 0
