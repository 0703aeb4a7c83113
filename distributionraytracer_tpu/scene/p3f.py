"""P3F scene-file parser.

Token-for-token equivalent of ``Scene::load_p3f`` (scene.cpp:474-740):

- ``accel none|grid|bvh``
- ``spp N``
- ``mat cd(3) Kd cs(3) Ks Shine T ior``  — sets the current material
- ``s cx cy cz r``                        — sphere
- ``box minx miny minz maxx maxy maxz``
- ``p 3`` + 9 floats                      — triangle
- ``mesh nV nF`` + vertices + 1-based (or negative, scene.cpp:578-593) faces
- ``npl nx ny nz D`` / ``pl`` + 9 floats  — planes
- ``light punctual pos color`` / ``light quad pos color v1 v2 gridRes``
- ``camera eye.. at.. up.. angle hither resolution aperture focal``
- ``bclr r g b``
- ``env skydir``                          — skybox directory (6 jpgs)
- ``# ...``                               — comment to end of line

Parsing is whitespace-token based like ``ifstream >>`` so layouts with
numbers spread across lines parse identically.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from distributionraytracer_tpu.scene.builder import SceneBuilder
from distributionraytracer_tpu.scene.skybox import load_skybox
from distributionraytracer_tpu.scene.types import (
    ACCEL_BVH, ACCEL_GRID, ACCEL_NONE, SceneData,
)


class _Tokens:
    """Stream of whitespace tokens with `#` comment-to-eol handling.

    The reference handles comments only at command position (scene.cpp:724-727)
    and it consumes to end of line; we mirror that by splitting per line and
    dropping tokens after a token starting with '#' only when the caller asks
    for a command token.
    """

    def __init__(self, text: str):
        self._lines = text.splitlines()
        self._toks: List[str] = []
        self._li = 0  # next line to pull from
        self._ti = 0

    def _fill(self):
        while self._ti >= len(self._toks) and self._li < len(self._lines):
            self._toks.extend(self._lines[self._li].split())
            self._li += 1

    def next(self) -> Optional[str]:
        self._fill()
        if self._ti >= len(self._toks):
            return None
        t = self._toks[self._ti]
        self._ti += 1
        return t

    def skip_line(self):
        """Drop remaining tokens of the current logical line (comment)."""
        # tokens already buffered past _ti belong to lines <= _li-1; emulate
        # `ignore('\n')` by dropping buffered tokens.
        self._toks = self._toks[: self._ti]

    def floats(self, n: int) -> List[float]:
        return [float(self.next()) for _ in range(n)]

    def ints(self, n: int) -> List[int]:
        return [int(self.next()) for _ in range(n)]


def load_p3f(path: str, load_sky: bool = True) -> SceneData:
    with open(path, "r") as f:
        text = f.read()
    base_dir = os.path.dirname(os.path.abspath(path))
    tk = _Tokens(text)
    b = SceneBuilder()

    while True:
        cmd = tk.next()
        if cmd is None:
            break
        if cmd.startswith("#"):
            tk.skip_line()
            continue
        if cmd == "accel":
            t = tk.next()
            b.accel = {"none": ACCEL_NONE, "grid": ACCEL_GRID,
                       "bvh": ACCEL_BVH}[t]
        elif cmd == "spp":
            b.spp = int(tk.next())
        elif cmd == "mat":
            v = tk.floats(11)
            b.add_material(v[0:3], v[3], v[4:7], v[7], v[8], v[9], v[10])
        elif cmd == "s":
            v = tk.floats(4)
            b.add_sphere(v[0:3], v[3])
        elif cmd == "box":
            v = tk.floats(6)
            b.add_box(v[0:3], v[3:6])
        elif cmd == "p":
            nv = int(tk.next())
            if nv != 3:
                raise ValueError("unsupported polygon vertex count")
            v = tk.floats(9)
            b.add_triangle(v[0:3], v[3:6], v[6:9])
        elif cmd == "mesh":
            nv, nf = tk.ints(2)
            verts = np.array(tk.floats(3 * nv), np.float32).reshape(nv, 3)
            faces = np.array(tk.ints(3 * nf), np.int64).reshape(nf, 3)
            # 1-based indices, or negative offsets from the end
            # (scene.cpp:578-593: P0 > 0 -> subtract 1; else add nV)
            faces = np.where(faces[:, :1] > 0, faces - 1, faces + nv)
            b.add_triangles_bulk(verts, faces)
        elif cmd == "npl":
            v = tk.floats(4)
            b.add_plane_hessian(v[0:3], v[3])
        elif cmd == "pl":
            v = tk.floats(9)
            b.add_plane_points(v[0:3], v[3:6], v[6:9])
        elif cmd == "light":
            t = tk.next()
            if t == "punctual":
                v = tk.floats(6)
                b.add_point_light(v[0:3], v[3:6])
            elif t == "quad":
                v = tk.floats(12)
                gr = int(tk.next())
                b.add_quad_light(v[0:3], v[3:6], v[6:9], v[9:12], gr)
            else:
                raise ValueError(f"unsupported light type {t}")
        elif cmd == "camera":
            def expect(name):
                got = tk.next()
                if got != name:
                    raise ValueError(f"'{name}' expected, got {got!r}")
            expect("eye"); eye = tk.floats(3)
            expect("at"); at = tk.floats(3)
            expect("up"); up = tk.floats(3)
            expect("angle"); fov = float(tk.next())
            expect("hither"); hither = float(tk.next())
            expect("resolution"); rx, ry = tk.ints(2)
            expect("aperture"); ap = float(tk.next())
            expect("focal"); fr = float(tk.next())
            b.set_camera(eye, at, up, fov, hither, rx, ry, ap, fr)
        elif cmd == "bclr":
            b.bg_color = np.array(tk.floats(3), np.float32)
        elif cmd == "env":
            sky_dir = tk.next()
            if load_sky:
                # the reference resolves the skybox dir relative to its CWD
                # (the project root), one level above P3D_Scenes/
                for root in (base_dir, os.path.dirname(base_dir)):
                    cand = os.path.join(root, sky_dir)
                    if os.path.isdir(cand):
                        b.sky_faces, b.sky_res = load_skybox(cand)
                        break
                else:
                    raise FileNotFoundError(f"skybox dir {sky_dir!r}")
        else:
            raise ValueError(f"unknown P3F command {cmd!r}")

    return b.build()
