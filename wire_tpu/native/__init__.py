"""Host-side native (C++) components, built on demand with g++ and bound via
ctypes — the two genuinely native capabilities on the reference's workflow
paths (SURVEY.md §2.4/§7.6):

- ``marching_cubes(volume, iso)``: replaces PyMCubes
  (volutils.py:413-438).
- ``rigid_register(ref, moving)``: replaces pystackreg/ECC registration
  (motion.py:401-429, 575-642).

Plus pure-python mesh writers (.obj and .dae collada) replacing
``mcubes.export_mesh``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_HERE, "_build")
_LIB = None


def _compile():
    os.makedirs(_BUILD, exist_ok=True)
    so = os.path.join(_BUILD, "libwire_native.so")
    srcs = [os.path.join(_HERE, "marching_cubes.cpp"),
            os.path.join(_HERE, "registration.cpp")]
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(so) and os.path.getmtime(so) >= newest_src:
        return so
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", so] + srcs
    subprocess.run(cmd, check=True, capture_output=True)
    return so


def _lib():
    global _LIB
    if _LIB is None:
        so = _compile()
        lib = ctypes.CDLL(so)
        lib.mc_run.restype = ctypes.c_int
        lib.mc_run.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
            ctypes.POINTER(ctypes.c_long)]
        lib.mc_free.argtypes = [ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_int)]
        lib.rigid_register.restype = ctypes.c_int
        lib.rigid_register.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float)]
        _LIB = lib
    return _LIB


def marching_cubes(volume, iso):
    """Extract the iso-surface of a (nx, ny, nz) float volume.
    Returns (vertices (n,3) float32 in voxel coords, faces (m,3) int32)."""
    vol = np.ascontiguousarray(volume, dtype=np.float32)
    nx, ny, nz = vol.shape
    lib = _lib()
    verts_p = ctypes.POINTER(ctypes.c_float)()
    tris_p = ctypes.POINTER(ctypes.c_int)()
    nverts = ctypes.c_long()
    ntris = ctypes.c_long()
    rc = lib.mc_run(vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    nx, ny, nz, ctypes.c_float(iso),
                    ctypes.byref(verts_p), ctypes.byref(nverts),
                    ctypes.byref(tris_p), ctypes.byref(ntris))
    if rc != 0:
        raise RuntimeError(f"mc_run failed with code {rc}")
    nv, nt = nverts.value, ntris.value
    verts = np.ctypeslib.as_array(verts_p, shape=(nv, 3)).copy() if nv \
        else np.zeros((0, 3), np.float32)
    faces = np.ctypeslib.as_array(tris_p, shape=(nt, 3)).copy() if nt \
        else np.zeros((0, 3), np.int32)
    lib.mc_free(verts_p, tris_p)
    return verts, faces


def rigid_register(ref, moving, max_iters=100, eps=1e-6, init_warp=None):
    """Estimate the 2x3 Euclidean warp aligning ``moving`` onto ``ref``
    (dst(x,y) = moving(W [x y 1]^T) ≈ ref(x,y))."""
    ref = np.ascontiguousarray(ref, np.float32)
    moving = np.ascontiguousarray(moving, np.float32)
    assert ref.shape == moving.shape and ref.ndim == 2
    h, w = ref.shape
    warp = np.eye(2, 3, dtype=np.float32) if init_warp is None else \
        np.ascontiguousarray(init_warp, np.float32)
    rc = _lib().rigid_register(
        ref.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        moving.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, max_iters, ctypes.c_float(eps),
        warp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise RuntimeError("rigid_register: singular normal equations")
    return warp


# ---------------------------------------------------------------------------
# Mesh export (replaces mcubes.export_mesh)
# ---------------------------------------------------------------------------

def export_mesh(vertices, faces, path):
    if path.endswith(".obj"):
        export_obj(vertices, faces, path)
    elif path.endswith(".dae"):
        export_dae(vertices, faces, path)
    else:
        raise ValueError(f"unsupported mesh format: {path}")


def export_obj(vertices, faces, path):
    with open(path, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in faces:
            f.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")


def export_dae(vertices, faces, path):
    """Minimal COLLADA 1.4 document with one triangle mesh."""
    pos = " ".join(f"{x:g}" for x in np.asarray(vertices).ravel())
    idx = " ".join(str(i) for i in np.asarray(faces).ravel())
    nv = len(vertices)
    nt = len(faces)
    doc = f"""<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><up_axis>Z_UP</up_axis></asset>
  <library_geometries>
    <geometry id="mesh" name="mesh">
      <mesh>
        <source id="positions">
          <float_array id="positions-array" count="{nv * 3}">{pos}</float_array>
          <technique_common>
            <accessor source="#positions-array" count="{nv}" stride="3">
              <param name="X" type="float"/><param name="Y" type="float"/><param name="Z" type="float"/>
            </accessor>
          </technique_common>
        </source>
        <vertices id="verts"><input semantic="POSITION" source="#positions"/></vertices>
        <triangles count="{nt}">
          <input semantic="VERTEX" source="#verts" offset="0"/>
          <p>{idx}</p>
        </triangles>
      </mesh>
    </geometry>
  </library_geometries>
  <library_visual_scenes>
    <visual_scene id="scene">
      <node id="node"><instance_geometry url="#mesh"/></node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#scene"/></scene>
</COLLADA>
"""
    with open(path, "w") as f:
        f.write(doc)
