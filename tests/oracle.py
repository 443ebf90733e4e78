"""Independent scalar f64 CPU oracle for statistical render tests.

A deliberately simple, recursive NumPy implementation of the reference's
*live* integrator semantics (NEE + Russian roulette, no MIS), written from
the behavioral spec in SURVEY.md — NOT a translation of either the Rust or
the JAX code.  Slow (pure Python per-sample), used only on a few pixels at
modest spp to cross-check the wavefront integrator's estimates.

Uses the reference's f64 epsilons (sphere eps 1e-4, tri/plane cutoffs 1e-4,
hit offset 1e-5, visibility margin 1e-3).
"""

from __future__ import annotations

import math

import numpy as np

MAX_BOUNCES = 5
SURVIVAL = 0.9


def _norm(v):
    return v / math.sqrt(float(v @ v))


class Oracle:
    def __init__(
        self,
        doc: dict,
        rng: np.random.Generator,
        max_depth: int = 24,
        use_mis: bool = False,
    ):
        """doc: parsed TOML scene dict (spheres and planes only).

        ``use_mis=True`` estimates direct light with the balance heuristic
        (light sample weighted 1/(pdf_light_sa + pdf_brdf), BSDF-sampled
        emission weighted pdf_brdf/(pdf_brdf + pdf_light_sa), both in
        solid-angle measure) — the reference's dead branch
        (src/scene.rs:187-216) implemented *correctly*, per SURVEY §5.
        Restricted to diffuse/specular scenes: the reference never defined
        how its Phong absorption composes with MIS weights, and the spec'd
        MIS benchmark config (cornell_box) has no Phong either.
        """
        self.rng = rng
        self.max_depth = max_depth
        self.use_mis = use_mis
        self.cam_pos = np.asarray(doc["camera"]["pos"], float)
        self.cam_dir = np.asarray(doc["camera"]["dir"], float)
        self.objects = []
        for spec in doc["objects"]:
            g = spec["geometry"]
            # "triangles" is a test-only kind: explicit [[a,b,c], ...]
            # vertex triples, so tests can hand the SAME geometry to the
            # oracle and to build_scene_arrays without sharing loader code.
            assert g["type"] in ("sphere", "plane", "triangles"), (
                "oracle supports spheres/planes/explicit triangles"
            )
            self.objects.append(
                dict(
                    emitted=np.asarray(spec.get("emitted", [0, 0, 0]), float),
                    brdf=spec["brdf"],
                    geom=g,
                )
            )
        self.light = next(
            i for i, o in enumerate(self.objects) if np.abs(o["emitted"]).max() > 1e-5
        )
        if use_mis:
            assert all(o["brdf"]["type"] != "phong" for o in self.objects), (
                "oracle MIS supports diffuse/specular scenes only"
            )

    # --- geometry ---
    def intersect(self, ro, rd):
        """Nearest hit -> (t, pos, n, obj) or None."""
        best = None
        for i, o in enumerate(self.objects):
            g = o["geom"]
            if g["type"] == "sphere":
                c = np.asarray(g["pos"], float)
                r = float(g["r"])
                op = c - ro
                b = op @ rd
                det = b * b - op @ op + r * r
                if det < 0:
                    continue
                sq = math.sqrt(det)
                t = b - sq
                if t <= 1e-4:
                    t = b + sq
                    if t <= 1e-4:
                        continue
                pos = ro + t * rd
                n = _norm(pos - c)
                if n @ rd > 0:
                    n = -n
            elif g["type"] == "plane":
                p = np.asarray(g["pos"], float)
                n0 = np.asarray(g["n"], float)
                dn = rd @ n0
                if abs(dn) < 1e-4:
                    continue
                t = ((p - ro) @ n0) / dn
                if t < 0:
                    continue
                n = n0 if (n0 @ rd) <= 0 else -n0
                pos = ro + t * rd + n * 1e-5
            else:  # triangles
                t = None
                for tri in g["tris"]:
                    a = np.asarray(tri[0], float)
                    e1 = np.asarray(tri[1], float) - a
                    e2 = np.asarray(tri[2], float) - a
                    ng = np.cross(e1, e2)
                    nu = ng / np.linalg.norm(ng)
                    dn = rd @ nu
                    if abs(dn) < 1e-4:
                        continue
                    tt = ((a - ro) @ nu) / dn
                    if tt <= 1e-4 or (t is not None and tt >= t):
                        continue
                    ph = ro + tt * rd
                    nn = float(ng @ ng)
                    u = (ph - a) @ np.cross(e2, ng) / nn
                    v = (ph - a) @ np.cross(ng, e1) / nn
                    if u < 0 or u > 1 or v < 0 or u + v > 1:
                        continue
                    t = tt
                    n = nu if dn <= 0 else -nu
                    pos = ph + n * 1e-5
                if t is None:
                    continue
            if best is None or t < best[0]:
                if g["type"] == "sphere":
                    pos = ro + t * rd
                best = (t, pos, n, i)
        return best

    def visible(self, x, y):
        d = y - x
        dist = math.sqrt(float(d @ d))
        hit = self.intersect(x, d / dist)
        return hit is None or hit[0] + 1e-3 >= dist

    # --- materials ---
    def f_eval(self, brdf, n, o, i):
        if brdf["type"] == "diffuse":
            return np.asarray(brdf["kd"], float) / math.pi
        if brdf["type"] == "phong":
            # kd*color_d/pi + ks*color_s*(p+2)/2pi * max(o . reflect(i,n),0)^p
            # (reference BRDF::eval, src/scene.rs:41-52)
            kd, ks = float(brdf["kd"]), float(brdf["ks"])
            power = float(brdf["power"])
            refl = 2.0 * float(i @ n) * n - i
            cos_r = max(float(o @ refl), 0.0)
            return (
                kd * np.asarray(brdf["color_d"], float) / math.pi
                + ks
                * np.asarray(brdf["color_s"], float)
                * (power + 2.0)
                / (2.0 * math.pi)
                * (cos_r ** power)
            )
        raise AssertionError

    def light_area(self):
        g = self.objects[self.light]["geom"]
        return 4.0 * math.pi * float(g["r"]) ** 2

    def q_pdf(self, n, i):
        """Solid-angle density of the oracle's own cosine BSDF sampler at i."""
        return max(float(n @ i), 0.0) / math.pi

    def sample_light(self):
        g = self.objects[self.light]["geom"]
        c = np.asarray(g["pos"], float)
        r = float(g["r"])
        u1, u2 = self.rng.random(), self.rng.random()
        z = 2 * u1 - 1
        rr = math.sqrt(max(1 - z * z, 0.0))
        n = np.asarray([rr * math.cos(2 * math.pi * u2), rr * math.sin(2 * math.pi * u2), z])
        return c + r * n, n, 1.0 / (4 * math.pi * r * r)

    def reflected(self, x, n, o, obj, depth):
        if depth > self.max_depth:
            return np.zeros(3)
        ob = self.objects[obj]
        p = 1.0 if depth <= MAX_BOUNCES else SURVIVAL
        brdf = ob["brdf"]
        if brdf["type"] == "specular":
            rad = np.zeros(3)
            if self.rng.random() < p:
                i = 2 * (o @ n) * n - o  # mirror
                hit = self.intersect(x, i)
                if hit is not None:
                    _, hx, hn, hobj = hit
                    ks = np.asarray(brdf["ks"], float)
                    nxt = self.objects[hobj]["emitted"] / p + self.reflected(
                        hx, hn, -i, hobj, depth + 1
                    ) * ks / p
                    rad = nxt
            return rad
        # non-specular: NEE + cont
        y, ny, pdf = self.sample_light()
        i = y - x
        r2 = float(i @ i)
        i = i / math.sqrt(r2)
        vis = 1.0 if self.visible(x, y) else 0.0
        e = self.objects[self.light]["emitted"]
        f = self.f_eval(brdf, n, o, i)
        if self.use_mis:
            # Light-sample term with the balance weight: the 1/pdf_l_sa
            # estimator times pdf_l_sa/(pdf_l_sa + pdf_brdf) collapses to
            # 1/(pdf_l_sa + pdf_brdf).
            cos_x = float(n @ i)
            cos_y = float(ny @ -i)
            if vis > 0.0 and cos_x > 0.0 and cos_y > 0.0:
                p_l_sa = pdf * r2 / cos_y
                rad = e * f * cos_x / (p_l_sa + self.q_pdf(n, i))
            else:
                rad = np.zeros(3)
        else:
            rad = e * f * vis * (n @ i) * (ny @ -i) / (r2 * pdf)
        # Phong continuation: the reference's 3-way sample (cosine w.p. kd,
        # power-lobe w.p. ks, DEAD otherwise, each weighted by its own
        # branch pdf) has expectation (kd+ks) * integral — i.e. (1-kd-ks)
        # absorption.  The oracle reproduces that expectation with plain
        # Russian roulette at (kd+ks) + cosine sampling (any sampling pdf
        # gives the same expectation), staying estimator-independent.
        if brdf["type"] == "phong":
            if self.rng.random() >= float(brdf["kd"]) + float(brdf["ks"]):
                return rad
        if self.rng.random() < p:
            u1, u2 = self.rng.random(), self.rng.random()
            z = math.sqrt(u1)
            rr = math.sqrt(max(1 - z * z, 0.0))
            phi = 2 * math.pi * u2
            local = np.asarray([rr * math.cos(phi), rr * math.sin(phi), z])
            w = n
            a = np.asarray([0.0, 1.0, 0.0]) if abs(w[0]) > 0.1 else np.asarray([1.0, 0.0, 0.0])
            u = _norm(np.cross(a, w))
            v = np.cross(w, u)
            i = _norm(u * local[0] + v * local[1] + w * local[2])
            pdf_b = (n @ i) / math.pi
            hit = self.intersect(x, i)
            if hit is not None and pdf_b > 1e-12:
                t_h, hx, hn, hobj = hit
                f = self.f_eval(brdf, n, o, i)
                nxt = self.reflected(hx, hn, -i, hobj, depth + 1)
                if self.use_mis and hobj == self.light:
                    # BSDF-sampled direct light, balance-weighted (hn is
                    # already two-sided so hn.-i > 0 at a real hit).
                    cos_yb = max(float(hn @ -i), 1e-8)
                    p_l_sa = (t_h * t_h) / (cos_yb * self.light_area())
                    q = self.q_pdf(n, i)
                    nxt = nxt + self.objects[hobj]["emitted"] * (q / (q + p_l_sa))
                rad = rad + nxt * f * (n @ i) / (pdf_b * p)
        return rad

    def received(self, ro, rd):
        hit = self.intersect(ro, rd)
        if hit is None:
            return np.zeros(3)
        _, x, n, obj = hit
        return self.objects[obj]["emitted"] + self.reflected(x, n, -rd, obj, 1)

    def pixel_radiance_mean(self, px, py, width, height, spp):
        """Mean unclamped per-subpixel radiance [4,3] at (px, py render-space)."""
        w, h = float(width), float(height)
        cx = np.asarray([0.5135 * w / h, 0.0, 0.0])
        cy = _norm(np.cross(cx, self.cam_dir)) * 0.5135
        num = spp // 4
        out = np.zeros((4, 3))
        for s in range(4):
            sx, sy = s % 2, s // 2
            acc = np.zeros(3)
            for _ in range(num):
                r1 = 2 * self.rng.random()
                dx = math.sqrt(r1) - 1 if r1 < 1 else 1 - math.sqrt(2 - r1)
                r2 = 2 * self.rng.random()
                dy = math.sqrt(r2) - 1 if r2 < 1 else 1 - math.sqrt(2 - r2)
                d = (
                    cx * (((sx + 0.5 + dx) / 2 + px) / w - 0.5)
                    + cy * (((sy + 0.5 + dy) / 2 + py) / h - 0.5)
                    + self.cam_dir
                )
                acc += self.received(self.cam_pos, _norm(d))
            out[s] = acc / max(num, 1)
        return out
