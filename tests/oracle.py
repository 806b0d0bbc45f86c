"""Independent CPU oracle tracer for MSE gates.

A deliberately simple, recursive numpy implementation of the *algorithm*
specified by the reference (``/root/reference/src``, see SURVEY.md §3) —
the estimator, sampling distributions, camera model, volume march and all
behavioral quirks — written without looking at the wavefront code paths it
validates. The Rust reference binary cannot run in this image, so this
oracle is the statistical ground truth our TPU renders are gated against
(BASELINE.md "MSE vs CPU reference").

Slow by design (~10k rays/s): use tiny images and low spp in tests.
"""

from __future__ import annotations

import numpy as np

FRONT, BACK, VOLUME, VOLUME_FRONT, VOLUME_BACK = 0, 1, 2, 3, 4


def norm(v):
    return v / np.linalg.norm(v)


def reflect(v, n):
    return v - 2.0 * np.dot(v, n) * n


def refract(v, n, ior):
    cos_theta = min(np.dot(-v, n), 1.0)
    perp = (n * cos_theta + v) * ior
    parallel = n * -np.sqrt(abs(1.0 - perp @ perp))
    return perp + parallel


def fresnel(v, n, ior):
    cos_theta = min(np.dot(-v, n), 1.0)
    r0 = ((1 - ior) / (1 + ior)) ** 2
    return r0 + (1 - r0) * (1 - cos_theta) ** 5


def frame(n):
    n = norm(n)
    a = np.array([0.0, 1.0, 0.0]) if abs(n[0]) > 0.9 else np.array([1.0, 0.0, 0.0])
    t = norm(np.cross(n, a))
    return t, np.cross(n, t)


def unit_sphere(rng):
    r1 = rng.uniform(0, 2 * np.pi)
    r2 = rng.uniform()
    s = 2 * np.sqrt(r2 * (1 - r2))
    return np.array([np.cos(r1) * s, np.sin(r1) * s, 1 - 2 * r2])


def unit_hemisphere(rng, n):
    r1 = rng.uniform(0, 2 * np.pi)
    r2 = rng.uniform()
    s = 2 * np.sqrt(r2 * (1 - r2))
    t, b = frame(n)
    return t * np.cos(r1) * s + b * np.sin(r1) * s + n * (1 - r2)


def cosine_hemisphere(rng, n):
    r1 = rng.uniform(0, 2 * np.pi)
    r2 = rng.uniform()
    t, b = frame(n)
    return t * np.cos(r1) * np.sqrt(r2) + b * np.sin(r1) * np.sqrt(r2) + n * np.sqrt(1 - r2)


class Prim:
    """One hit-testable object: sphere or rect list (cuboid = 6 rects)."""

    def __init__(self, kind, mat, is_light, **kw):
        self.kind = kind
        self.mat = mat
        self.is_light = is_light
        self.__dict__.update(kw)


class Oracle:
    def __init__(self, scene, max_bounces=8, max_volume_bounces=32,
                 clip=(0.01, 1000.0), volume_step=0.1, seed=0, geo=None):
        from bendy_tpu.geodesic import GeoParams
        from bendy_tpu.scene.graph import Cuboid, Rect, Sphere
        from bendy_tpu.scene.graph import transform_point, transform_vector

        self.rng = np.random.default_rng(seed)
        self.max_b = max_bounces
        self.max_vb = max_volume_bounces
        self.clip = clip
        self.step = volume_step
        self.scene = scene
        self.geo = geo or GeoParams()
        # geodesic masses: objects tagged "mass:<rs>" (matches the compiler)
        self.masses = [
            (np.asarray(o.transform.world[:, 3], np.float64),
             float(o.tag.split(":", 1)[1]))
            for o in scene.iter()
            if o.tag and o.tag.startswith("mass:")
        ]
        self.prims = []
        for ref, obj in scene.pairs():
            w = obj.transform.world
            if isinstance(obj.inner, Sphere):
                vol = None
                if obj.inner.volume is not None:
                    vol = scene.get_data(obj.inner.volume).as_volume()
                self.prims.append(
                    Prim("sphere", obj.inner.material, obj.has_flags(1),
                         center=w[:, 3], radius=obj.inner.radius, vol=vol)
                )
            elif isinstance(obj.inner, Rect):
                self.prims.append(
                    Prim("rects", obj.inner.material, obj.has_flags(1),
                         faces=[self._face(w, np.zeros(3), obj.inner)])
                )
            elif isinstance(obj.inner, Cuboid):
                self.prims.append(
                    Prim("rects", None, obj.has_flags(1),
                         faces=[self._face(w, off, r) for off, r in obj.inner.faces])
                )

    @staticmethod
    def _face(w, offset, rect):
        """World-space face under a general affine [M | t] (``rect.rs:110-142``).

        fx/fy = forward bases M·x̂ (random_point); ux/uy = inverse-transposed
        bases M⁻ᵀ·x̂ so containment (p−c)·ux ≡ (A⁻¹p)·x̂ is exact under any
        affine; z = unit normal of the transformed plane; area = world area.
        All coincide with the rigid-transform values when M is a rotation.
        """
        from bendy_tpu.scene.graph import transform_point

        m_lin = np.asarray(w[:, :3], np.float64)
        fx = m_lin @ np.asarray(rect.x, np.float64)
        fy = m_lin @ np.asarray(rect.y, np.float64)
        n_raw = np.cross(fx, fy)
        minv_t = np.linalg.inv(m_lin).T
        return dict(
            center=transform_point(w, offset),
            x=fx,
            y=fy,
            ux=minv_t @ np.asarray(rect.x, np.float64),
            uy=minv_t @ np.asarray(rect.y, np.float64),
            z=n_raw / np.linalg.norm(n_raw),
            hw=rect.half_width,
            hh=rect.half_height,
            area=4.0 * rect.half_width * rect.half_height * np.linalg.norm(n_raw),
            mat=rect.material,
        )

    # -- intersections ------------------------------------------------------

    def _hit_sphere(self, p, org, d, cmin, cmax):
        oc = org - p.center
        half_b = oc @ d
        c = oc @ oc - p.radius**2
        disc = half_b**2 - c
        if disc < 0:
            return None
        sq = np.sqrt(disc)
        t = -half_b - sq
        if t < cmin or t > cmax:
            t = -half_b + sq
            if t < cmin or t > cmax:
                return None
        pos = org + t * d
        n = (pos - p.center) / p.radius
        front = d @ n < 0
        if not front:
            n = -n
        if p.vol is not None:
            face = VOLUME_FRONT if front else VOLUME_BACK
        else:
            face = FRONT if front else BACK
        return dict(t=t, pos=pos, n=n, face=face, mat=p.mat, prim=p,
                    bbox=(p.center - p.radius, np.full(3, 2 * p.radius)))

    def _hit_face(self, f, org, d, cmin, cmax):
        q = d @ f["z"]
        if abs(q) <= 1e-5:
            return None
        pcoord = (f["center"] - org) @ f["z"]
        t = pcoord / q
        if t < cmin or t > cmax:
            return None
        pos = org + t * d
        local = pos - f["center"]
        if (local @ f["ux"]) ** 2 > f["hw"] ** 2 or (local @ f["uy"]) ** 2 > f["hh"] ** 2:
            return None
        n, face = (f["z"], FRONT) if pcoord < 0 else (-f["z"], BACK)
        return dict(t=t, pos=pos, n=n, face=face, mat=f["mat"], prim=None, bbox=None)

    def _hit_prim(self, p, org, d, cmin, cmax):
        if p.kind == "sphere":
            return self._hit_sphere(p, org, d, cmin, cmax)
        best = None
        for f in p.faces:
            h = self._hit_face(f, org, d, cmin, cmax)
            if h and (best is None or h["t"] < best["t"]):
                best = h
        return best

    def _try_hit(self, org, d, cmin, cmax, march_prim=None):
        best, bt = None, cmax
        for p in self.prims:
            if march_prim is not None and p is march_prim:
                end = org + cmax * d
                if (end - p.center) @ (end - p.center) <= p.radius**2:
                    h = dict(t=cmax, pos=end, n=np.zeros(3), face=VOLUME, mat=p.mat,
                             prim=p, bbox=(p.center - p.radius, np.full(3, 2 * p.radius)))
                else:
                    h = self._hit_sphere(p, org, d, cmin, bt)
            else:
                h = self._hit_prim(p, org, d, cmin, bt)
            if h and h["t"] <= bt:
                best, bt = h, h["t"]
        return best

    # -- light sampling -------------------------------------------------

    def _lights(self):
        return [p for p in self.prims if p.is_light]

    def _random_point(self, p):
        if p.kind == "sphere":
            return p.center + unit_sphere(self.rng) * p.radius
        areas = np.array([f["area"] for f in p.faces])
        f = p.faces[self.rng.choice(len(p.faces), p=areas / areas.sum())]
        return (
            f["center"]
            + f["x"] * self.rng.uniform(-f["hw"], f["hw"])
            + f["y"] * self.rng.uniform(-f["hh"], f["hh"])
        )

    def _light_pdf(self, p, org, d):
        h = self._hit_prim(p, org, d, *self.clip)
        if h is None:
            return 0.0
        if p.kind == "sphere":
            return h["t"] ** 2 / (np.pi * p.radius**2)
        # nearest face's pdf (``cuboid.rs:56-81``)
        best = None
        for f in p.faces:
            hf = self._hit_face(f, org, d, *self.clip)
            if hf and (best is None or hf["t"] < best[0]["t"]):
                best = (hf, f)
        hf, f = best
        return hf["t"] ** 2 / (f["area"] * abs(d @ hf["n"]))

    # -- materials --------------------------------------------------------

    def _emitted(self, mat):
        if mat.kind == "flat":
            return np.asarray(mat.albedo)
        if mat.kind == "emissive":
            return np.asarray(mat.albedo) * mat.intensity
        return np.zeros(3)

    # -- geodesic propagation (mirrors bendy_tpu.geodesic semantics) -------

    def _accel(self, x, d):
        """a = -(3/2)·rs·h²·r̂/r⁴ summed over masses (geodesic.py:67-80)."""
        a = np.zeros(3)
        for c, rs in self.masses:
            rel = x - c
            r2 = rel @ rel
            hv = np.cross(rel, d)
            inv_r = 1.0 / np.sqrt(max(r2, 1e-20)) if r2 > 0 else 0.0
            a = a + rel * (-1.5 * rs * (hv @ hv) * inv_r**5)
        return a

    def _geo_step_size(self, x, steps):
        r2_min = min((x - c) @ (x - c) for c, _ in self.masses)
        eta = self.geo.eta * (1.0 + self.geo.growth * steps)
        return float(np.clip(eta * np.sqrt(r2_min), self.geo.min_step, self.geo.max_step))

    def _rk4(self, x, d, ds):
        half = ds * 0.5
        k1x, k1d = d, self._accel(x, d)
        k2x = d + k1d * half
        k2d = self._accel(x + k1x * half, k2x)
        k3x = d + k2d * half
        k3d = self._accel(x + k2x * half, k3x)
        k4x = d + k3d * ds
        k4d = self._accel(x + k3x * ds, k4x)
        sixth = ds / 6.0
        return (x + (k1x + (k2x + k3x) * 2.0 + k4x) * sixth,
                d + (k1d + (k2d + k3d) * 2.0 + k4d) * sixth)

    def _capture_and_far(self, x, d):
        captured, far = False, True
        for c, rs in self.masses:
            rel = x - c
            r2 = rel @ rel
            captured = captured or r2 < rs * rs
            far = far and (r2 > (self.geo.far * rs) ** 2 and rel @ d > 0.0)
        return captured, far

    # -- integrator -------------------------------------------------------

    def sample(self, org, d, bounce, geo_steps=0):
        if bounce > self.max_b:
            return np.zeros(3)
        if not self.masses:
            h = self._try_hit(org, d, *self.clip)
            if h is None:
                return self._sample_root()
            if h["face"] in (FRONT, BACK):
                return self._sample_surface(h, d, bounce)
            return self._sample_volume(h, d, bounce, 0)

        # curved space: RK4 chord stepping, straight trace along each
        # chord; far receding rays switch to an exact full-clip trace;
        # horizon crossings and step-budget exhaustion are swallowed.
        # clip_min applies only to the first segment after a bounce.
        fresh = True
        while True:
            captured, far = self._capture_and_far(org, d)
            if captured or geo_steps > self.geo.max_steps:
                return np.zeros(3)
            if far:
                h = self._try_hit(org, d, self.clip[0] if fresh else 0.0, self.clip[1])
                if h is None:
                    return self._sample_root()
                return self._dispatch(h, d, bounce, geo_steps)
            ds = self._geo_step_size(org, geo_steps)
            x2, d2 = self._rk4(org, d, ds)
            chord = x2 - org
            clen = float(np.linalg.norm(chord))
            seg = chord / max(clen, 1e-20)
            h = self._try_hit(org, seg, self.clip[0] if fresh else 0.0, clen)
            geo_steps += 1
            if h is not None:
                return self._dispatch(h, seg, bounce, geo_steps)
            org, d = x2, d2
            fresh = False

    def _dispatch(self, h, d, bounce, geo_steps):
        if h["face"] in (FRONT, BACK):
            return self._sample_surface(h, d, bounce, geo_steps)
        return self._sample_volume(h, d, bounce, 0, geo_steps)

    def _sample_root(self):
        mat = self.scene.root_material_data()
        if mat.kind in ("flat", "emissive"):
            return self._emitted(mat)
        return np.asarray(mat.albedo)

    def _sample_surface(self, h, d, bounce, geo_steps=0):
        mat = self.scene.get_data(h["mat"]).as_material()
        emitted = self._emitted(mat)
        if mat.kind in ("flat", "emissive"):
            return emitted
        albedo = np.asarray(mat.albedo)
        n, pos = h["n"], h["pos"]
        if mat.kind == "diffuse":
            lights = self._lights()
            light = lights[self.rng.integers(len(lights))]
            if self.rng.uniform() < 0.5:
                nd = norm(self._random_point(light) - pos)
            else:
                nd = cosine_hemisphere(self.rng, n)
            pdf_cos = (n @ nd) / np.pi
            pdf = 0.5 * (pdf_cos + self._light_pdf(light, pos, nd))
            if abs(pdf) <= 1e-5:
                return np.zeros(3)
            w = albedo * pdf_cos / pdf
        elif mat.kind == "metallic":
            nd = norm(reflect(d, n) + unit_hemisphere(self.rng, n) * mat.roughness)
            w = albedo
        elif mat.kind == "glass":
            ior = 1.0 / mat.ior if h["face"] in (FRONT, VOLUME_FRONT) else mat.ior
            cos_t = min(-d @ n, 1.0)
            sin_t = np.sqrt(max(1 - cos_t**2, 0.0))
            if ior * sin_t > 1.0 or self.rng.uniform() < fresnel(d, n, ior):
                base = reflect(d, n)
            else:
                base = refract(d, n, ior)
            nd = norm(base + unit_hemisphere(self.rng, n) * mat.roughness)
            w = albedo
        else:
            raise ValueError(mat.kind)
        return emitted + w * self.sample(pos, nd, bounce + 1, geo_steps)

    def _density(self, vol, coord):
        c = np.clip(coord, 0.0, 1.0) * vol.size
        g = vol.grid()  # [d,h,w]
        i0 = np.floor(c).astype(int)
        i1 = np.minimum(i0 + 1, vol.size.astype(int))
        f = c - i0

        def at(xi, yi, zi):
            return g[zi, yi, xi]

        def lerp(a, b, t):
            return a + (b - a) * t

        y0 = lerp(at(i0[0], i0[1], i0[2]), at(i1[0], i0[1], i0[2]), f[0])
        y1 = lerp(at(i0[0], i1[1], i0[2]), at(i1[0], i1[1], i0[2]), f[0])
        z0 = lerp(y0, y1, f[1])
        y0 = lerp(at(i0[0], i0[1], i1[2]), at(i1[0], i0[1], i1[2]), f[0])
        y1 = lerp(at(i0[0], i1[1], i1[2]), at(i1[0], i1[1], i1[2]), f[0])
        z1 = lerp(y0, y1, f[1])
        return lerp(z0, z1, f[2])

    def _sample_volume(self, h, d, bounce, vbounce, geo_steps=0):
        vol = h["prim"].vol
        bbox_min, bbox_size = h["bbox"]
        coord = (h["pos"] - bbox_min) / bbox_size
        density = self.step * self._density(vol, coord)
        if density >= 1.0 or self.rng.uniform() < density:
            o = h["pos"].copy()
            if h["face"] == VOLUME:
                o -= d * self.step * self.rng.uniform()
            nd = unit_sphere(self.rng)
            att = np.full(3, 0.8)
        else:
            o, nd, att = h["pos"], d, np.ones(3)
        if h["face"] == VOLUME_BACK:
            rec = self.sample(o, nd, bounce + 1, geo_steps)
        else:
            rec = self._sample_volumetric(o, nd, h["prim"], bounce, vbounce + 1, geo_steps)
        return att * rec

    def _sample_volumetric(self, org, d, last_prim, bounce, vbounce, geo_steps=0):
        if vbounce > self.max_vb:
            return np.zeros(3)
        # horizon capture applies during a march too: a medium enclosing a
        # mass must not let straight march segments tunnel through rs
        # (mirrors ops/wavefront geodesic capture of every alive lane)
        if self.masses and self._capture_and_far(org, d)[0]:
            return np.zeros(3)
        h = self._try_hit(org, d, 0.0, self.step, march_prim=last_prim)
        if h is None:
            return self._sample_root()
        if h["face"] in (FRONT, BACK):
            return self._sample_surface(h, d, bounce, geo_steps)
        return self._sample_volume(h, d, bounce, vbounce, geo_steps)

    # -- camera + film ------------------------------------------------------

    def render(self, cam, cam_world, width, height, spp, subsample=1):
        """Render [H,W,3] mean image with the reference's camera model."""
        yfov = 2 * np.arctan2(cam.sensor_size, 2 * cam.focal_length)
        xfov = yfov * cam.aspect_ratio
        rot = cam_world[:, :3]
        trans = cam_world[:, 3]
        pw, ph = 2.0 / width, 2.0 / height
        n = max(subsample, 1)
        img = np.zeros((height, width, 3))
        for y in range(height):
            for x in range(width):
                acc = np.zeros(3)
                for _ in range(spp):
                    for j in range(n):
                        for i in range(n):
                            u = x * pw - 1 + (i / n) * pw + self.rng.uniform(-0.5, 0.5) * pw / n
                            v = y * ph - 1 + (j / n) * ph + self.rng.uniform(-0.5, 0.5) * ph / n
                            yrot = xfov * 0.5 * -u
                            xrot = yfov * 0.5 * -v
                            dloc = np.array(
                                [
                                    -np.cos(xrot) * np.sin(yrot),
                                    np.sin(xrot),
                                    -np.cos(xrot) * np.cos(yrot),
                                ]
                            )
                            d = norm(rot @ dloc)
                            org = trans.copy()
                            if cam.focus is not None:
                                ang = self.rng.uniform(0, 2 * np.pi)
                                r = self.rng.uniform()
                                defocus = np.array([np.cos(ang), np.sin(ang), 0.0]) * r
                                aperture = 0.5 * cam.focal_length / cam.fstop
                                off = rot @ (defocus * aperture)
                                frac = cam.focus / abs(dloc[2])
                                org = org + off
                                d = norm(d * frac - off)
                            acc += self.sample(org, d, 0)
                img[y, x] = acc / (spp * n * n)
        return img
