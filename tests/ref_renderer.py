"""Independent referee path tracer (pure numpy).

Shares no sampling/shading/traversal code with vision_tpu: its own
transform math, Moller-Trumbore sweep, NEE + cosine BSDF sampling with
balance-heuristic MIS, one-sided emission, no RR. This is the "CPU
reference path" SURVEY.md §4 calls for — an absolute-energy referee the
product integrator must match depth-by-depth (tests/test_referee.py).

Scope: diffuse materials, quad/cube shapes, one-sided area lights, the
pinhole fixture camera — enough to referee the cornell-box energy chain.
"""
import numpy as np


class RefTracer:
    def __init__(self, scene_json, seed=0):
        from vision_tpu.scene import shapes  # geometry only (mesh topology)
        mats = {m["name"]: np.array(m["param"]["color"], np.float32)
                for m in scene_json["materials"]}
        tris = []
        for sh in scene_json["shapes"]:
            p = sh["param"]
            if sh["type"] == "quad":
                m = shapes.make_quad(p.get("width", 1.0), p.get("height", 1.0))
            else:
                m = shapes.make_cube(1.0)
            P, T = np.asarray(m.positions), np.asarray(m.triangles)
            M = np.asarray(p["transform"]["param"]["matrix4x4"], np.float32)
            Pw = P @ M[:3, :3] + M[3, :3]      # row-vector convention
            alb = mats.get(p.get("material"), np.zeros(3, np.float32))
            em = np.zeros(3, np.float32)
            if "emission" in p:
                em = np.array(p["emission"]["param"]["color"]["node"],
                              np.float32)
            for t in T:
                a, b, c = Pw[t[0]], Pw[t[1]], Pw[t[2]]
                tris.append((a, b - a, c - a, alb, em))
        self.P0 = np.stack([t[0] for t in tris])
        self.E1 = np.stack([t[1] for t in tris])
        self.E2 = np.stack([t[2] for t in tris])
        self.ALB = np.stack([t[3] for t in tris])
        self.EM = np.stack([t[4] for t in tris])
        self.light_ids = np.nonzero(self.EM.sum(-1) > 0)[0]
        li = self.light_ids
        self.L_p0, self.L_e1, self.L_e2 = self.P0[li], self.E1[li], self.E2[li]
        self.L_area = 0.5 * np.linalg.norm(
            np.cross(self.L_e1, self.L_e2), axis=-1)
        self.L_n = np.cross(self.L_e1, self.L_e2)
        self.L_n /= np.linalg.norm(self.L_n, axis=-1, keepdims=True)
        self.L_em = self.EM[li]
        cam = scene_json["camera"]["param"]
        self.fov = float(cam.get("fov_y", 19.5))
        self.rng = np.random.default_rng(seed)
        self.EPS = 1e-4

    def intersect(self, o, d, tmax=None):
        pv = np.cross(d[:, None, :], self.E2[None])
        det = (self.E1[None] * pv).sum(-1)
        inv = np.where(np.abs(det) > 1e-12,
                       1.0 / np.where(det == 0, 1, det), 0.0)
        tv = o[:, None, :] - self.P0[None]
        u = (tv * pv).sum(-1) * inv
        qv = np.cross(tv, self.E1[None])
        v = (d[:, None, :] * qv).sum(-1) * inv
        t = (self.E2[None] * qv).sum(-1) * inv
        ok = ((np.abs(det) > 1e-12) & (u >= -1e-7) & (v >= -1e-7)
              & (u + v <= 1 + 1e-7) & (t > 1e-5))
        t = np.where(ok, t, np.inf)
        idx = np.argmin(t, -1)
        tmin = t[np.arange(len(o)), idx]
        hit = np.isfinite(tmin)
        if tmax is not None:
            return hit & (tmin < tmax)
        return tmin, np.where(hit, idx, -1)

    def sample_light(self, n):
        li = self.rng.integers(0, len(self.light_ids), n)
        u1 = self.rng.random(n)
        u2 = self.rng.random(n)
        su = np.sqrt(u1)
        b1 = 1 - su
        b2 = u2 * su
        p = (self.L_p0[li] + b1[:, None] * self.L_e1[li]
             + b2[:, None] * self.L_e2[li])
        pdf_a = (1.0 / len(self.light_ids)) / self.L_area[li]
        return p, self.L_n[li], self.L_em[li], pdf_a

    def trace(self, res, depth):
        """One 1-spp pass; returns [res, res, 3] linear radiance."""
        rng = self.rng
        n = res * res
        x = (np.tile(np.arange(res), res) + rng.random(n)) / res
        y = (np.repeat(np.arange(res), res) + rng.random(n)) / res
        tanf = np.tan(np.deg2rad(self.fov) / 2)
        d = np.stack([(2 * x - 1) * tanf, (1 - 2 * y) * tanf,
                      -np.ones(n)], -1)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.tile(np.array([0, 1, 6.8], np.float32), (n, 1))
        L = np.zeros((n, 3))
        thr = np.ones((n, 3))
        spec_pdf = np.full(n, 1e16)
        act = np.ones(n, bool)
        nl_count = len(self.light_ids)
        for bounce in range(depth):
            t, idx = self.intersect(o, d)
            act = act & (idx >= 0)
            ii = np.maximum(idx, 0)
            pos = o + t[:, None] * d
            ng = np.cross(self.E1[ii], self.E2[ii])
            ng /= np.maximum(np.linalg.norm(ng, axis=-1, keepdims=True),
                             1e-12)
            # emission hit with MIS (one-sided lights: front face only)
            em = self.EM[ii]
            front = (ng * d).sum(-1) < 0.0
            is_em = (em.sum(-1) > 0) & front
            cos_l = np.abs((ng * d).sum(-1))
            a_i = 0.5 * np.linalg.norm(
                np.cross(self.E1[ii], self.E2[ii]), axis=-1)
            pdf_l = ((1.0 / nl_count) / np.maximum(a_i, 1e-12)
                     * t * t / np.maximum(cos_l, 1e-9))
            wmis = np.where(bounce == 0, 1.0,
                            spec_pdf / (spec_pdf + pdf_l))
            L += np.where((act & is_em)[:, None],
                          thr * em * wmis[:, None], 0.0)
            # NEE
            alb = self.ALB[ii]
            pl, nl, eml, pdfa = self.sample_light(n)
            wi = pl - pos
            dist = np.linalg.norm(wi, axis=-1)
            wi /= np.maximum(dist[:, None], 1e-12)
            ngf = np.where(((-d) * ng).sum(-1)[:, None] < 0, -ng, ng)
            cos_s = (wi * ngf).sum(-1)
            cos_l2 = np.maximum((-wi * nl).sum(-1), 0.0)
            so = pos + ngf * np.sign(cos_s)[:, None] * self.EPS
            occ = self.intersect(so, wi, tmax=dist * (1 - 1e-3))
            pdf_sa = pdfa * dist * dist / np.maximum(cos_l2, 1e-9)
            f = alb / np.pi
            bsdf_pdf = np.maximum(cos_s, 0.0) / np.pi
            wm = pdf_sa / (pdf_sa + bsdf_pdf)
            good = act & (~occ) & (cos_s > 0) & (cos_l2 > 1e-6)
            contrib = f * (eml * (np.maximum(cos_s, 0)
                                  / pdf_sa * wm)[:, None])
            L += np.where(good[:, None], thr * contrib, 0.0)
            # BSDF sample (cosine hemisphere)
            u1 = rng.random(n)
            u2 = rng.random(n)
            r = np.sqrt(u1)
            phi = 2 * np.pi * u2
            lz = np.sqrt(np.maximum(1 - u1, 0))
            a = np.where(np.abs(ngf[:, 2:3]) < 0.9,
                         np.array([0, 0, 1.0]), np.array([1.0, 0, 0]))
            tx = np.cross(a, ngf)
            tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True),
                             1e-12)
            ty = np.cross(ngf, tx)
            nd = (tx * (r * np.cos(phi))[:, None]
                  + ty * (r * np.sin(phi))[:, None] + ngf * lz[:, None])
            thr = thr * alb
            spec_pdf = np.maximum(lz, 1e-9) / np.pi
            o = pos + ngf * self.EPS
            d = nd
            act = act & (thr.max(-1) > 0)
        return L.reshape(res, res, 3)

    def render(self, res, spp, depth):
        acc = 0
        for _ in range(spp):
            acc = acc + self.trace(res, depth)
        return acc / spp
