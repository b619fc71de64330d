"""SceneBuilder — the user-facing scene construction API.

The reference's scene-description layer is an empty stub
(`pbrt_init/pbrt_parse_file/pbrt_cleanup`, src/core/mod.rs:36-38); this
module supplies the working equivalent: a host-side builder that
accumulates meshes/quadrics/materials/lights in numpy and emits the
device Scene pytree (geom.scene.Scene).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .core.types import Float, Int
from .geom.types import (TriangleSoA, QuadricSoA, QUAD_SPHERE, QUAD_DISK,
                         QUAD_CYLINDER, QUAD_CONE, QUAD_PARABOLOID, QUAD_HYPERBOLOID)
from .geom import scene as scenemod
from .shade import materials as matmod
from .lights import lights as lightsmod


class SceneBuilder:
    def __init__(self):
        self._verts = []
        self._normals = []
        self._uvs = []
        self._tris = []
        self._tri_mat = []
        self._tri_light = []
        self._tri_has_ns = []
        self._vert_base = 0
        self._quads = []      # (kind, o2w, params, mat, light)
        self._materials = []
        self._lights = []
        self._env_image = None
        self._env_to_world = None
        self._media = None
        self._textures = None
        self._protos = []          # instanced prototype TriangleSoAs
        self._instances = []       # (proto_id, material, T0, T1 or None)
        self.use_bvh = False
        self.spatial_light_distrib = False

    @property
    def textures(self):
        """Lazily-created TextureBuilder; pass texture ids to material
        *_tex kwargs (e.g. kd_tex=b.textures.checkerboard(...))."""
        from .shade.textures import TextureBuilder
        if self._textures is None:
            self._textures = TextureBuilder()
        return self._textures

    # ---- materials -----------------------------------------------------
    def material(self, **kw):
        """Add a material row (see shade.materials.build_materials)."""
        self._materials.append(kw)
        return len(self._materials) - 1

    def matte(self, kd, sigma=0.0):
        return self.material(kind=matmod.MAT_MATTE, kd=kd, sigma=sigma)

    def plastic(self, kd, ks, roughness=0.1, remap=True):
        return self.material(kind=matmod.MAT_PLASTIC, kd=kd, ks=ks,
                             roughness=(roughness, roughness), remap_roughness=remap)

    def glass(self, kr=1.0, kt=1.0, eta=1.5, roughness=0.0, remap=True):
        return self.material(kind=matmod.MAT_GLASS, kr=kr, kt=kt, eta=eta,
                             roughness=(roughness, roughness), remap_roughness=remap)

    def metal(self, eta=(0.2, 0.92, 1.1), k=(3.9, 2.45, 2.14), roughness=0.01, ks=1.0, remap=True):
        return self.material(kind=matmod.MAT_METAL, metal_eta=eta, metal_k=k, ks=ks,
                             roughness=(roughness, roughness), remap_roughness=remap)

    def mirror(self, kr=0.9):
        return self.material(kind=matmod.MAT_MIRROR, kr=kr)

    def substrate(self, kd, ks, roughness=0.1, remap=True):
        return self.material(kind=matmod.MAT_SUBSTRATE, kd=kd, ks=ks,
                             roughness=(roughness, roughness), remap_roughness=remap)

    def uber(self, kd=0.25, ks=0.25, kr=0.0, opacity=1.0, roughness=0.1, eta=1.5):
        return self.material(kind=matmod.MAT_UBER, kd=kd, ks=ks, kr=kr,
                             opacity=opacity, roughness=(roughness, roughness), eta=eta)

    def translucent(self, kd=0.25, reflect=0.5, transmit=0.5):
        return self.material(kind=matmod.MAT_TRANSLUCENT, kd=kd, kr=reflect, kt=transmit)

    def fourier(self, bsdf_file=None, table=None):
        """Measured FourierBSDF material (reflection.rs:1282-1300): pass
        a PBRT-v3 .bsdf path or a prebuilt shade.fourier.FourierTable."""
        if table is None:
            from .shade.fourier import load_bsdf_file
            table = load_bsdf_file(bsdf_file)
        return self.material(kind=matmod.MAT_FOURIER, fourier_table=table)

    def subsurface(self, sigma_a=(0.0011, 0.0024, 0.014), sigma_s=(2.55, 3.21, 3.77),
                   g=0.0, eta=1.33, scale=1.0, roughness=0.0, remap=True):
        """Tabulated-BSSRDF subsurface material (bssrdf.rs:324-493 +
        path.rs:154-198 probe-ray transport; defaults ≈ skim milk)."""
        aux = list(np.broadcast_to(np.asarray(sigma_a, np.float32), (3,))) \
            + list(np.broadcast_to(np.asarray(sigma_s, np.float32), (3,))) \
            + [g, scale]
        # kr/kt = 1: the dielectric interface lobes weight by Fresnel
        # internally (the entry (1-Fr) of S; bssrdf.rs:60-130)
        return self.material(kind=matmod.MAT_SUBSURFACE, eta=eta, aux=aux,
                             kr=1.0, kt=1.0,
                             roughness=(roughness, roughness), remap_roughness=remap)

    # ---- geometry ------------------------------------------------------
    def add_mesh(self, vertices, indices, material, normals=None, uvs=None, light=-1):
        """vertices (V,3), indices (T,3). Returns global tri index range."""
        v = np.asarray(vertices, np.float32)
        i = np.asarray(indices, np.int32).reshape(-1, 3)
        t0 = len(self._tris) * 0 + sum(len(t) for t in self._tris)
        self._verts.append(v)
        self._normals.append(np.asarray(normals, np.float32) if normals is not None
                             else np.zeros_like(v))
        self._uvs.append(np.asarray(uvs, np.float32) if uvs is not None
                         else np.zeros((len(v), 2), np.float32))
        self._tris.append(i + self._vert_base)
        self._tri_mat.append(np.full(len(i), material, np.int32))
        self._tri_light.append(np.full(len(i), light, np.int32))
        self._tri_has_ns.append(np.full(len(i), normals is not None, bool))
        self._vert_base += len(v)
        return t0, t0 + len(i)

    def add_quad(self, p0, p1, p2, p3, material, light=-1, uvs=None):
        """Planar quad as two triangles (p0..p3 CCW)."""
        v = np.array([p0, p1, p2, p3], np.float32)
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32) if uvs is None else uvs
        return self.add_mesh(v, [[0, 1, 2], [0, 2, 3]], material, uvs=uv, light=light)

    def _add_quadric(self, kind, o2w, params, material, light=-1):
        o2w = np.asarray(o2w, np.float32)
        self._quads.append((kind, o2w, np.asarray(params, np.float32), material, light))
        return len(self._quads) - 1

    def add_sphere(self, center, radius, material, light=-1, z_min=None, z_max=None,
                   phi_max=2 * np.pi):
        o2w = np.eye(4, dtype=np.float32)
        o2w[:3, 3] = center
        r = float(radius)
        params = [r, -r if z_min is None else z_min, r if z_max is None else z_max,
                  phi_max, 0.0, 0.0]
        return self._add_quadric(QUAD_SPHERE, o2w, params, material, light)

    def add_disk(self, o2w, radius, material, height=0.0, inner_radius=0.0,
                 phi_max=2 * np.pi, light=-1):
        return self._add_quadric(QUAD_DISK, o2w, [radius, 0, 0, phi_max, height, inner_radius],
                                 material, light)

    def add_cylinder(self, o2w, radius, z_min, z_max, material, phi_max=2 * np.pi, light=-1):
        return self._add_quadric(QUAD_CYLINDER, o2w, [radius, z_min, z_max, phi_max, 0, 0],
                                 material, light)

    def add_cone(self, o2w, radius, height, material, phi_max=2 * np.pi, light=-1):
        return self._add_quadric(QUAD_CONE, o2w, [radius, 0, height, phi_max, height, 0],
                                 material, light)

    def add_paraboloid(self, o2w, radius, z_min, z_max, material, phi_max=2 * np.pi, light=-1):
        return self._add_quadric(QUAD_PARABOLOID, o2w, [radius, z_min, z_max, phi_max, 0, 0],
                                 material, light)

    def add_hyperboloid(self, o2w, a, c, z_min, z_max, material, phi_max=2 * np.pi, light=-1):
        return self._add_quadric(QUAD_HYPERBOLOID, o2w,
                                 [max(abs(z_min), abs(z_max)), z_min, z_max, phi_max, a, c],
                                 material, light)

    # ---- instancing ------------------------------------------------------
    def instanced_prototype(self, vertices, indices, normals=None, uvs=None):
        """Register a mesh stored ONCE and shared by instances
        (TransformedPrimitive, primitive.rs:105-177). Returns proto id."""
        v = np.asarray(vertices, np.float32).reshape(-1, 3)
        idx = np.asarray(indices, np.int32).reshape(-1, 3)
        t = len(idx)
        n = np.asarray(normals, np.float32).reshape(-1, 3) if normals is not None \
            else np.zeros_like(v)
        uv = np.asarray(uvs, np.float32).reshape(-1, 2) if uvs is not None \
            else np.zeros((len(v), 2), np.float32)
        soa = TriangleSoA(
            positions=jnp.asarray(v), indices=jnp.asarray(idx),
            normals=jnp.asarray(n), uvs=jnp.asarray(uv),
            has_normals=jnp.asarray(np.full(t, normals is not None)),
            material_id=jnp.zeros(t, jnp.int32),
            light_id=jnp.full(t, -1, jnp.int32))
        self._protos.append(soa)
        return len(self._protos) - 1

    def add_instance(self, proto, material, transform, transform1=None,
                     emit=None):
        """Instance `proto` under a 4x4 object-to-world `transform`;
        `transform1` (optional) is the shutter-close transform — rigid
        motion blur via per-ray quaternion slerp (transform.rs:2010).

        `emit` (optional RGB radiance) makes the instance an AREA LIGHT:
        the transformed prototype triangles are registered in the light
        table (explicit world-space corners), so NEE / BDPT / SPPM
        sample it like any tri area light while the geometry stays
        instanced. This goes beyond the reference, whose
        TransformedPrimitive::get_area_light returns None
        (primitive.rs:161-163). Animated emissive instances are
        rejected (the light table is static)."""
        light_id = -1
        if emit is not None:
            t1a = None if transform1 is None else np.asarray(transform1)
            if t1a is not None and not np.allclose(t1a, np.asarray(transform)):
                raise ValueError("emissive instances cannot be animated")
            p = np.asarray(self._protos[int(proto)].positions)
            idx = np.asarray(self._protos[int(proto)].indices).reshape(-1, 3)
            m = np.asarray(transform, np.float64)
            pw = p @ m[:3, :3].T + m[:3, 3]
            corners = np.concatenate([pw[idx[:, 0]], pw[idx[:, 1]],
                                      pw[idx[:, 2]]], axis=1)   # (T, 9)
            light_id = len(self._lights)
            self._lights.append(dict(kind=lightsmod.LIGHT_AREA_TRI,
                                     tris=corners, L=emit))
        self._instances.append((int(proto), int(material),
                                np.asarray(transform, np.float64),
                                None if transform1 is None
                                else np.asarray(transform1, np.float64),
                                light_id))
        return len(self._instances) - 1

    # ---- media ---------------------------------------------------------
    def medium_interface(self, material, inside=-1, outside=0):
        """Per-primitive medium interface on `material` (primitive.rs
        MediumInterface semantics): medium id entered when transmitting
        into / out of surfaces carrying this material; -1 = vacuum.
        Consumed by volpath's transmission step."""
        self._materials[material]["med_inside"] = int(inside)
        self._materials[material]["med_outside"] = int(outside)
        return material

    def set_homogeneous_medium(self, sigma_a, sigma_s, g=0.0):
        """Global scene-filling homogeneous medium (BASELINE config 4)."""
        from .shade import media as medmod
        self._media = medmod.build_media([
            dict(kind=medmod.MEDIUM_HOMOGENEOUS, sigma_a=sigma_a, sigma_s=sigma_s, g=g)])
        return 0

    def set_grid_medium(self, density, sigma_a, sigma_s, g=0.0, world_to_medium=None, scale=1.0):
        from .shade import media as medmod
        row = dict(kind=medmod.MEDIUM_GRID, sigma_a=sigma_a, sigma_s=sigma_s, g=g, scale=scale)
        if world_to_medium is not None:
            row["world_to_medium"] = world_to_medium
        self._media = medmod.build_media([row], grid=density)
        return 0

    # ---- lights --------------------------------------------------------
    def point_light(self, p, intensity):
        self._lights.append(dict(kind=lightsmod.LIGHT_POINT, p=p, I=intensity))
        return len(self._lights) - 1

    def spot_light(self, p, direction, intensity, cone_deg=30.0, falloff_deg=25.0):
        self._lights.append(dict(kind=lightsmod.LIGHT_SPOT, p=p, direction=direction,
                                 I=intensity, cone_deg=cone_deg, falloff_deg=falloff_deg))
        return len(self._lights) - 1

    def distant_light(self, direction_to_light, radiance):
        self._lights.append(dict(kind=lightsmod.LIGHT_DISTANT, direction=direction_to_light,
                                 L=radiance))
        return len(self._lights) - 1

    def area_light_quad(self, p0, p1, p2, p3, radiance, two_sided=False, material=None):
        """Emissive quad; creates matte-black material if none given."""
        if material is None:
            material = self.matte(kd=0.0)
        light_id = len(self._lights)
        t0, t1 = self.add_quad(p0, p1, p2, p3, material, light=light_id)
        self._lights.append(dict(kind=lightsmod.LIGHT_AREA_TRI,
                                 tri_ids=list(range(t0, t1)), L=radiance,
                                 two_sided=two_sided))
        return light_id

    def area_light_mesh(self, vertices, indices, radiance, two_sided=False, material=None):
        if material is None:
            material = self.matte(kd=0.0)
        light_id = len(self._lights)
        t0, t1 = self.add_mesh(vertices, indices, material, light=light_id)
        self._lights.append(dict(kind=lightsmod.LIGHT_AREA_TRI,
                                 tri_ids=list(range(t0, t1)), L=radiance,
                                 two_sided=two_sided))
        return light_id

    def area_light_sphere(self, center, radius, radiance, material=None):
        if material is None:
            material = self.matte(kd=0.0)
        light_id = len(self._lights)
        qid = self.add_sphere(center, radius, material, light=light_id)
        self._lights.append(dict(kind=lightsmod.LIGHT_AREA_SPHERE, quadric_id=qid, L=radiance))
        return light_id

    def infinite_light(self, radiance=1.0, image=None, env_to_world=None):
        self._lights.append(dict(kind=lightsmod.LIGHT_INFINITE, L=radiance))
        self._env_image = image
        self._env_to_world = env_to_world
        return len(self._lights) - 1

    # ---- build ---------------------------------------------------------
    def build(self, bvh=None):
        if not self._materials:
            # shape-less scenes (pure media / env-light tests) still need
            # a non-empty material table — gathers from 0-row tables fail
            self.matte(kd=(0.0, 0.0, 0.0))
        if self._tris:
            tri = TriangleSoA(
                positions=jnp.asarray(np.concatenate(self._verts)),
                indices=jnp.asarray(np.concatenate(self._tris)),
                normals=jnp.asarray(np.concatenate(self._normals)),
                uvs=jnp.asarray(np.concatenate(self._uvs)),
                has_normals=jnp.asarray(np.concatenate(self._tri_has_ns)),
                material_id=jnp.asarray(np.concatenate(self._tri_mat)),
                light_id=jnp.asarray(np.concatenate(self._tri_light)))
        else:
            tri = None
        if self._quads:
            o2w = np.stack([q[1] for q in self._quads])
            quad = QuadricSoA(
                kind=jnp.asarray(np.array([q[0] for q in self._quads], np.int32)),
                obj_to_world=jnp.asarray(o2w),
                world_to_obj=jnp.asarray(np.linalg.inv(o2w)),
                params=jnp.asarray(np.stack([q[2] for q in self._quads])),
                material_id=jnp.asarray(np.array([q[3] for q in self._quads], np.int32)),
                light_id=jnp.asarray(np.array([q[4] for q in self._quads], np.int32)))
        else:
            quad = None
        materials = matmod.build_materials(self._materials)
        lights = lightsmod.build_lights(self._lights, tri=tri, quad=quad,
                                        env_image=self._env_image,
                                        env_to_world=self._env_to_world)
        bvh_arrays = None
        cluster_set = None
        if (bvh if bvh is not None else self.use_bvh) and tri is not None:
            from .geom import cluster as clmod
            cluster_set = clmod.build_clusters(np.concatenate(self._verts),
                                               np.concatenate(self._tris))
        textures = self._textures.build() if self._textures is not None else None
        instance_sets = None
        if self._instances:
            from .geom import instances as instmod
            instance_sets = []
            for pid, proto in enumerate(self._protos):
                rows = [r for r in self._instances if r[0] == pid]
                if not rows:
                    continue
                t0s = [r[2] for r in rows]
                t1s = [r[3] if r[3] is not None else r[2] for r in rows]
                instance_sets.append(instmod.build_instances(
                    proto, t0s, [r[1] for r in rows], transforms1=t1s,
                    light_ids=[r[4] for r in rows]))
        scene = scenemod.make_scene(tri=tri, quad=quad, materials=materials,
                                    lights=lights, media=self._media, bvh=bvh_arrays,
                                    textures=textures, clusters=cluster_set,
                                    instances=instance_sets)
        if self.spatial_light_distrib:
            from .lights import distrib as distribmod
            scene = scene._replace(light_distrib=distribmod.build_spatial(scene, lights))
        return scene
