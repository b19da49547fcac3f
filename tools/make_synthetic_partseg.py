"""Synthetic part-segmentation benchmark generator (ShapeNetPart layout).

ACCURACY.md's cls benchmark (make_synthetic.py) measures the binary gap /
KD gain orderings for classification, but the partseg serving knobs and
the reference's partseg IoU orderings (README.md:117-121) had no
trained-checkpoint story without egress. This generator closes that: 16
composite categories with EXACTLY the ShapeNetPart part-count table
(seg_num = [4,2,2,4,4,3,3,2,4,2,6,2,3,3,3,3], index_start as in
data/datasets.py::ShapeNetPart, mirroring ref data.py:266-267), each
category composed of geometric primitives whose component id IS the part
label — so part boundaries are real geometric structure, learnable under
SO(3) rotation, not colorings.

Per-instance variation: component scale/position jitter, smooth warp
fields, spherical-cap occlusion (labels ride along), point jitter, and
outliers relabelled to their nearest surviving point (scan-style label
transfer). Writes the exact ShapeNetPart HDF5 layout the unmodified CLI
consumes (data (M, 2048, 3) f32 / label (M, 1) i64 / pid (M, 2048) i64):

  <out>/shapenet_part_hdf5/ply_data_train0.h5
  <out>/shapenet_part_hdf5/ply_data_test0.h5

Usage: python tools/make_synthetic_partseg.py --out /tmp/synth_pseg
           [--train 2400] [--test 600] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import make_synthetic as ms  # noqa: E402  (primitive samplers)

NPTS = 2048

SEG_NUM = [4, 2, 2, 4, 4, 3, 3, 2, 4, 2, 6, 2, 3, 3, 3, 3]
INDEX_START = [0, 4, 6, 8, 12, 16, 19, 22, 24, 28, 30, 36, 38, 41, 44, 47]


def _j(rng, lo, hi):
    return rng.uniform(lo, hi)


def _place(pts, scale, offset):
    return pts * np.asarray(scale, np.float64) + np.asarray(offset, np.float64)


def _bar(rng, n, r, p0, p1):
    """Thin cylinder from p0 to p1 (radius r)."""
    p0, p1 = np.asarray(p0, np.float64), np.asarray(p1, np.float64)
    t = rng.uniform(0, 1, n)
    axis = p1 - p0
    # orthonormal frame around the axis
    a = axis / max(np.linalg.norm(axis), 1e-9)
    h = np.array([1.0, 0, 0]) if abs(a[0]) < 0.9 else np.array([0, 1.0, 0])
    u = np.cross(a, h)
    u /= max(np.linalg.norm(u), 1e-9)
    v = np.cross(a, u)
    th = rng.uniform(0, 2 * np.pi, n)
    return (p0[None] + t[:, None] * axis[None]
            + r * (np.cos(th)[:, None] * u[None] + np.sin(th)[:, None] * v[None]))


def _half_torus(rng, n, r_minor, upper_axis=2):
    """Torus with the tube centre circle restricted to a half-plane."""
    p = ms.torus(rng, 2 * n, r_minor=r_minor)
    keep = p[:, 0] >= 0  # half over +x
    p = p[keep][:n]
    while len(p) < n:
        q = ms.torus(rng, 2 * n, r_minor=r_minor)
        q = q[q[:, 0] >= 0]
        p = np.concatenate([p, q], 0)[:n]
    if upper_axis != 0:
        p[:, [0, upper_axis]] = p[:, [upper_axis, 0]]
    return p


def _slab(rng, n, sx, sy, sz):
    return _place(ms.box(rng, n), (sx, sy, sz), (0, 0, 0))


# Each category: list of (local_part_id, fraction, builder(rng, n) -> (n,3)).
# Several components may share a part id (e.g. four legs are one part).


def cat_airplane(rng):
    L = _j(rng, 0.9, 1.1)
    w = _j(rng, 0.9, 1.3)
    return [
        (0, 0.38, lambda r, n: _place(ms.cylinder(r, n, cap_sphere=True,
                                                  h=1.0), (0.22, 0.22, L), (0, 0, 0))),
        (1, 0.34, lambda r, n: _place(ms.box(r, n), (w, 0.05, 0.16),
                                      (0, 0, 0.18 * L))),
        (2, 0.16, lambda r, n: np.concatenate([
            _place(ms.box(r, n // 2), (0.34 * w, 0.035, 0.10), (0, 0, -0.88 * L)),
            _place(ms.box(r, n - n // 2), (0.035, 0.26, 0.10),
                   (0, 0.12, -0.88 * L)),
        ], 0)),
        (3, 0.12, lambda r, n: np.concatenate([
            _bar(r, n // 2, 0.07, (-0.45 * w, -0.12, 0.38 * L),
                 (-0.45 * w, -0.12, -0.02 * L)),
            _bar(r, n - n // 2, 0.07, (0.45 * w, -0.12, 0.38 * L),
                 (0.45 * w, -0.12, -0.02 * L)),
        ], 0)),
    ]


def cat_bag(rng):
    h = _j(rng, 0.5, 0.7)
    return [
        (0, 0.8, lambda r, n: _place(ms.box(r, n, round_r=0.25),
                                     (0.7, 0.35, h), (0, 0, 0))),
        (1, 0.2, lambda r, n: _place(_half_torus(r, n, _j(rng, 0.08, 0.12)),
                                     (0.45, 0.45, 0.45), (0, 0, h))),
    ]


def cat_cap(rng):
    return [
        (0, 0.7, lambda r, n: _place(-ms.bowl(r, n), (0.8, 0.8, 0.55),
                                     (0, 0, 0))),
        (1, 0.3, lambda r, n: _place(ms.disk(r, n), (0.55, 0.4, 0.15),
                                     (0.75, 0, -0.02)),),
    ]


def cat_car(rng):
    L = _j(rng, 0.9, 1.15)
    return [
        (0, 0.42, lambda r, n: _place(ms.box(r, n, round_r=0.1),
                                      (L, 0.45, 0.22), (0, 0, 0))),
        (1, 0.22, lambda r, n: _place(ms.box(r, n, round_r=0.15),
                                      (0.5 * L, 0.4, 0.16), (-0.1 * L, 0, 0.34))),
        (2, 0.12, lambda r, n: _place(ms.box(r, n, round_r=0.1),
                                      (0.3 * L, 0.42, 0.1), (0.72 * L, 0, 0.1))),
        (3, 0.24, lambda r, n: np.concatenate([
            _place(_wheel(r, n // 4), (1, 1, 1), (0.6 * L, s1 * 0.48, -0.26))
            for s1, _ in [(1, 0), (-1, 0)]
        ] + [
            _place(_wheel(r, n - 2 * (n // 4)), (1, 1, 1),
                   (-0.6 * L, 0.48, -0.26))[: (n - 2 * (n // 4)) // 2],
            _place(_wheel(r, n - 2 * (n // 4)), (1, 1, 1),
                   (-0.6 * L, -0.48, -0.26))[(n - 2 * (n // 4)) // 2:],
        ], 0)),
    ]


def _wheel(rng, n):
    p = ms.torus(rng, max(n, 8), r_minor=0.3)
    p = p * 0.16
    p[:, [1, 2]] = p[:, [2, 1]]  # axis along y
    return p[:n]


def cat_chair(rng):
    h = _j(rng, 0.45, 0.6)
    return [
        (0, 0.3, lambda r, n: _place(ms.box(r, n), (0.5, 0.5, 0.05),
                                     (0, 0, 0))),
        (1, 0.3, lambda r, n: _place(ms.box(r, n), (0.5, 0.05, h),
                                     (0, -0.5, h + 0.05))),
        (2, 0.28, lambda r, n: np.concatenate([
            _bar(r, n // 4, 0.045, (sx * 0.42, sy * 0.42, -0.05),
                 (sx * 0.42, sy * 0.42, -h - 0.05))
            for sx, sy in [(1, 1), (1, -1), (-1, 1)]
        ] + [_bar(r, n - 3 * (n // 4), 0.045, (-0.42, -0.42, -0.05),
                  (-0.42, -0.42, -h - 0.05))], 0)),
        (3, 0.12, lambda r, n: np.concatenate([
            _bar(r, n // 2, 0.04, (0.46, -0.3, 0.05), (0.46, 0.4, 0.3)),
            _bar(r, n - n // 2, 0.04, (-0.46, -0.3, 0.05), (-0.46, 0.4, 0.3)),
        ], 0)),
    ]


def cat_earphone(rng):
    return [
        (0, 0.45, lambda r, n: _place(_half_torus(r, n, 0.08), (0.9, 0.9, 0.9),
                                      (0, 0, 0))),
        (1, 0.4, lambda r, n: np.concatenate([
            _place(ms.sphere(r, n // 2, aspect=0.55), (0.3, 0.3, 0.3),
                   (0, -0.9, 0)),
            _place(ms.sphere(r, n - n // 2, aspect=0.55), (0.3, 0.3, 0.3),
                   (0, 0.9, 0)),
        ], 0)),
        (2, 0.15, lambda r, n: _bar(r, n, 0.02, (0, -0.9, -0.3),
                                    (0.3, -1.2, -1.0))),
    ]


def cat_guitar(rng):
    return [
        (0, 0.12, lambda r, n: _place(ms.box(r, n), (0.14, 0.05, 0.18),
                                      (0, 0, 1.25))),
        (1, 0.22, lambda r, n: _bar(r, n, 0.05, (0, 0, 1.1), (0, 0, 0.1))),
        (2, 0.66, lambda r, n: _place(ms.disk(r, n),
                                      (0.55, _j(rng, 0.38, 0.5), 0.9),
                                      (0, 0, -0.5))),
    ]


def cat_knife(rng):
    return [
        (0, 0.6, lambda r, n: _place(ms.box(r, n), (0.05, 0.22, 0.9),
                                     (0, 0.05, 0.9))),
        (1, 0.4, lambda r, n: _place(ms.cylinder(r, n, caps=True, h=1.0),
                                     (0.09, 0.09, 0.45), (0, 0, -0.45))),
    ]


def cat_lamp(rng):
    return [
        (0, 0.25, lambda r, n: _place(ms.disk(r, n), (0.5, 0.5, 0.3),
                                      (0, 0, -1.0))),
        (1, 0.2, lambda r, n: _bar(r, n, 0.04, (0, 0, -1.0), (0, 0, 0.6))),
        (2, 0.4, lambda r, n: _place(ms.cone(r, n, r_top=_j(rng, 0.2, 0.4)),
                                     (0.55, 0.55, -0.35), (0, 0, 0.75))),
        (3, 0.15, lambda r, n: _place(ms.sphere(r, n), (0.16, 0.16, 0.16),
                                      (0, 0, 0.55))),
    ]


def cat_laptop(rng):
    a = _j(rng, 0.35, 0.6)  # screen opening angle factor
    return [
        (0, 0.5, lambda r, n: _place(ms.box(r, n), (0.6, 0.45, 0.03),
                                     (0, 0, 0))),
        (1, 0.5, lambda r, n: _tilt(_place(ms.box(r, n), (0.6, 0.45, 0.03),
                                           (0, 0, 0)), a, (0, -0.45, 0))),
    ]


def _tilt(p, a, hinge):
    """Rotate about the x-axis by angle a*pi/2 around a hinge point."""
    th = a * np.pi / 2
    q = p - np.asarray(hinge)
    y = q[:, 1] * np.cos(th) - q[:, 2] * np.sin(th)
    z = q[:, 1] * np.sin(th) + q[:, 2] * np.cos(th)
    out = np.stack([q[:, 0], y, z], 1) + np.asarray(hinge)
    return out


def cat_motor(rng):
    return [
        (0, 0.28, lambda r, n: np.concatenate([
            _place(3.2 * _wheel(r, n // 2), (1, 1, 1), (0.75, 0, -0.3)),
            _place(3.2 * _wheel(r, n - n // 2), (1, 1, 1), (-0.75, 0, -0.3)),
        ], 0)),
        (1, 0.12, lambda r, n: np.concatenate([
            _bar(r, n // 2, 0.03, (-0.6, 0, 0.35), (-0.75, -0.3, 0.55)),
            _bar(r, n - n // 2, 0.03, (-0.6, 0, 0.35), (-0.75, 0.3, 0.55)),
        ], 0)),
        (2, 0.2, lambda r, n: _place(ms.sphere(r, n, aspect=1.3),
                                     (0.3, 0.2, 0.22), (-0.15, 0, 0.22))),
        (3, 0.14, lambda r, n: _place(ms.box(r, n, round_r=0.2),
                                      (0.3, 0.14, 0.05), (0.35, 0, 0.18))),
        (4, 0.16, lambda r, n: _bar(r, n, 0.08, (0.75, 0, -0.3),
                                    (-0.75, 0, -0.3))),
        (5, 0.1, lambda r, n: _bar(r, n, 0.05, (0.1, 0.12, -0.25),
                                   (0.9, 0.18, 0.05))),
    ]


def cat_mug(rng):
    h = _j(rng, 0.5, 0.7)
    return [
        (0, 0.78, lambda r, n: np.concatenate([
            _place(ms.cylinder(r, int(n * 0.85), caps=False, h=1.0),
                   (0.5, 0.5, h), (0, 0, 0)),
            _place(ms.disk(r, n - int(n * 0.85)), (0.5, 0.5, 0.2),
                   (0, 0, -h)),
        ], 0)),
        (1, 0.22, lambda r, n: _place(_half_torus(r, n, 0.1),
                                      (0.32, 0.32, 0.32), (0.5, 0, 0))),
    ]


def cat_pistol(rng):
    return [
        (0, 0.45, lambda r, n: _place(ms.cylinder(r, n, caps=True, h=1.0),
                                      (0.1, 0.12, 0.55), (0.3, 0, 0.3))[:, [2, 1, 0]]),
        (1, 0.4, lambda r, n: _tilt(_place(ms.box(r, n, round_r=0.15),
                                           (0.1, 0.14, 0.35), (0, 0, 0)),
                                    -0.25, (0, 0, 0)) + np.array([-0.15, 0, -0.25])),
        (2, 0.15, lambda r, n: _place(_half_torus(r, n, 0.12),
                                      (0.16, 0.16, 0.16), (0.05, 0, -0.12))),
    ]


def cat_rocket(rng):
    L = _j(rng, 0.9, 1.1)
    return [
        (0, 0.55, lambda r, n: _place(ms.cylinder(r, n, caps=False, h=1.0),
                                      (0.25, 0.25, L), (0, 0, 0))),
        (1, 0.25, lambda r, n: _place(ms.cone(r, n, r_top=0.02),
                                      (0.25, 0.25, -0.35), (0, 0, L + 0.35))),
        (2, 0.2, lambda r, n: np.concatenate([
            _place(ms.box(r, n // 3), (0.02, 0.3, 0.25),
                   _rotz_off(2 * np.pi * j / 3, 0.32, -0.85 * L))
            for j in range(2)
        ] + [_place(ms.box(r, n - 2 * (n // 3)), (0.3, 0.02, 0.25),
                    (0, 0.32, -0.85 * L))], 0)),
    ]


def _rotz_off(a, r, z):
    return (r * np.cos(a), r * np.sin(a), z)


def cat_skateboard(rng):
    return [
        (0, 0.55, lambda r, n: _place(ms.box(r, n, round_r=0.2),
                                      (1.0, 0.3, 0.035), (0, 0, 0))),
        (1, 0.15, lambda r, n: np.concatenate([
            _bar(r, n // 2, 0.035, (0.6, -0.2, -0.05), (0.6, 0.2, -0.05)),
            _bar(r, n - n // 2, 0.035, (-0.6, -0.2, -0.05), (-0.6, 0.2, -0.05)),
        ], 0)),
        (2, 0.3, lambda r, n: np.concatenate([
            _place(0.9 * _wheel(r, n // 4), (1, 1, 1),
                   (sx * 0.6, sy * 0.22, -0.12))
            for sx, sy in [(1, 1), (1, -1), (-1, 1)]
        ] + [_place(0.9 * _wheel(r, n - 3 * (n // 4)), (1, 1, 1),
                    (-0.6, -0.22, -0.12))], 0)),
    ]


def cat_table(rng):
    h = _j(rng, 0.55, 0.75)
    return [
        (0, 0.45, lambda r, n: _place(ms.box(r, n), (0.8, 0.5, 0.04),
                                      (0, 0, 0))),
        (1, 0.4, lambda r, n: np.concatenate([
            _bar(r, n // 4, 0.05, (sx * 0.7, sy * 0.42, -0.04),
                 (sx * 0.7, sy * 0.42, -h))
            for sx, sy in [(1, 1), (1, -1), (-1, 1)]
        ] + [_bar(r, n - 3 * (n // 4), 0.05, (-0.7, -0.42, -0.04),
                  (-0.7, -0.42, -h))], 0)),
        (2, 0.15, lambda r, n: _bar(r, n, 0.04, (-0.7, 0, -h * 0.85),
                                    (0.7, 0, -h * 0.85))),
    ]


CATEGORIES = [
    ("airplane", cat_airplane), ("bag", cat_bag), ("cap", cat_cap),
    ("car", cat_car), ("chair", cat_chair), ("earphone", cat_earphone),
    ("guitar", cat_guitar), ("knife", cat_knife), ("lamp", cat_lamp),
    ("laptop", cat_laptop), ("motor", cat_motor), ("mug", cat_mug),
    ("pistol", cat_pistol), ("rocket", cat_rocket),
    ("skateboard", cat_skateboard), ("table", cat_table),
]
assert len(CATEGORIES) == 16


def occlude_labeled(rng, p, pid, max_frac):
    """Spherical-cap occlusion that keeps labels aligned; resamples kept
    points (with their pids) to restore the count."""
    d = ms._unit(rng.normal(size=(1, 3)))
    proj = p @ d[0]
    frac = rng.uniform(0.0, max_frac)
    thr = np.quantile(proj, 1 - frac)
    keep = proj <= thr
    if keep.sum() < len(p) // 2:
        keep = proj <= np.quantile(proj, 0.5)
    kept, kpid = p[keep], pid[keep]
    idx = rng.integers(0, len(kept), len(p) - len(kept))
    return (np.concatenate([kept, kept[idx]], 0),
            np.concatenate([kpid, kpid[idx]], 0))


def make_cloud(rng, cat_id, hard=True):
    name, builder = CATEGORIES[cat_id]
    comps = builder(rng)
    fr = np.array([f for _, f, _ in comps], np.float64)
    fr = fr / fr.sum()
    counts = np.maximum((fr * NPTS).astype(int), 8)
    counts[-1] += NPTS - counts.sum()
    pts, pid = [], []
    for (part, _, fn), c in zip(comps, counts):
        q = fn(rng, int(c))
        assert q.shape == (int(c), 3), (name, part, q.shape, c)
        pts.append(q)
        pid.append(np.full(int(c), INDEX_START[cat_id] + part, np.int64))
    p = np.concatenate(pts, 0)
    pid = np.concatenate(pid, 0)
    p = p * rng.uniform(0.9, 1.1, (1, 3))  # mild anisotropic scale
    if hard:
        p = ms.warp(rng, p, strength=rng.uniform(0.04, 0.15))
        p, pid = occlude_labeled(rng, p, pid, max_frac=0.3)
        p = p + rng.normal(0, 0.015, p.shape)
        n_out = rng.integers(0, NPTS // 60)  # sparse outliers
        if n_out:
            out_idx = rng.integers(0, NPTS, n_out)
            newp = rng.uniform(-1.2, 1.2, (n_out, 3))
            # scan-style label transfer: outlier keeps the pid of its
            # nearest surviving (non-outlier) point
            rest = np.setdiff1d(np.arange(NPTS), out_idx)
            d2 = ((newp[:, None] - p[rest][None]) ** 2).sum(-1)
            pid[out_idx] = pid[rest[np.argmin(d2, 1)]]
            p[out_idx] = newp
    else:
        p = p + rng.normal(0, 0.008, p.shape)
    p = p - p.mean(0, keepdims=True)
    p = p / np.max(np.linalg.norm(p, axis=1))
    perm = rng.permutation(NPTS)
    return p[perm].astype(np.float32), pid[perm]


def write_split(rng, path, per_class, hard):
    import h5py

    M = per_class * 16
    data = np.empty((M, NPTS, 3), np.float32)
    label = np.empty((M, 1), np.int64)
    pid = np.empty((M, NPTS), np.int64)
    order = rng.permutation(M)
    i = 0
    for c in range(16):
        for _ in range(per_class):
            data[order[i]], pid[order[i]] = make_cloud(rng, c, hard)
            label[order[i], 0] = c
            i += 1
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data)
        f.create_dataset("label", data=label)
        f.create_dataset("pid", data=pid)
    # invariant: every pid lies in its category's part range
    lo = np.asarray(INDEX_START)[label[:, 0]]
    hi = lo + np.asarray(SEG_NUM)[label[:, 0]]
    assert ((pid >= lo[:, None]) & (pid < hi[:, None])).all()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synth_pseg")
    ap.add_argument("--train", type=int, default=2400)
    ap.add_argument("--test", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--easy", action="store_true")
    args = ap.parse_args()
    d = os.path.join(args.out, "shapenet_part_hdf5")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    write_split(rng, os.path.join(d, "ply_data_train0.h5"),
                args.train // 16, not args.easy)
    write_split(rng, os.path.join(d, "ply_data_test0.h5"),
                args.test // 16, not args.easy)
    print(f"wrote {args.train // 16 * 16} train / {args.test // 16 * 16} "
          f"test clouds, 16 categories / 50 parts -> {d}")


if __name__ == "__main__":
    main()
