"""Synthetic rotation-invariant classification benchmark generator.

Round 2's recipe-validation dataset saturated (FP hit 1.000, ACCURACY.md),
so binary-gap / KD-gain orderings were unmeasurable. This generator is the
HARDENED v2 (VERDICT r2 item 4): 20 classes arranged in deliberately
confusable pairs (sphere/ellipsoid, cube/rounded-box, cylinder/capsule,
cone/frustum/pyramid, torus/thin-torus/washer, helix-2/helix-4, ...),
overlapping per-class parameter ranges, smooth random warp fields, partial
spherical-cap occlusion (scan simulation), jitter and outliers, and few
samples per class — tuned so the FP teacher lands well below 1.0 and the
reference's characteristic orderings (FP > binary+KD > binary,
README.md:113-115) become measurable without egress.

Writes the exact ModelNet40 HDF5 layout the unmodified CLI consumes:
  <out>/modelnet40_ply_hdf5_2048/ply_data_train0.h5  {data (M, 2048, 3) f32,
                                                      label (M, 1) i64}
  <out>/modelnet40_ply_hdf5_2048/ply_data_test0.h5

Usage: python tools/make_synthetic.py --out /root/synth_v2 [--train 2400]
           [--test 600] [--seed 0] [--easy]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

NPTS = 2048  # file layout; the CLI slices --num-points


# ---------------------------------------------------------------------------
# surface samplers: return (n, 3) points on the canonical shape
# ---------------------------------------------------------------------------


def _unit(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-9)


def sphere(rng, n, aspect=1.0):
    p = _unit(rng.normal(size=(n, 3)))
    p[:, 2] *= aspect
    return p


def box(rng, n, round_r=0.0):
    # faces sampled by area; optional edge rounding by projecting to an
    # inflated box (minkowski-ish)
    face = rng.integers(0, 6, n)
    uv = rng.uniform(-1, 1, (n, 2))
    p = np.empty((n, 3))
    ax = face // 2
    sign = np.where(face % 2 == 0, 1.0, -1.0)
    for i in range(3):
        m = ax == i
        p[m, i] = sign[m]
        p[m, (i + 1) % 3] = uv[m, 0]
        p[m, (i + 2) % 3] = uv[m, 1]
    if round_r > 0:
        q = np.clip(p, -1 + round_r, 1 - round_r)
        p = q + round_r * _unit(p - q)
    return p


def cylinder(rng, n, caps=False, cap_sphere=False, h=1.0):
    nc = int(n * 0.25) if (caps or cap_sphere) else 0
    ns = n - 2 * nc
    th = rng.uniform(0, 2 * np.pi, ns)
    z = rng.uniform(-h, h, ns)
    side = np.stack([np.cos(th), np.sin(th), z], 1)
    parts = [side]
    for s in (1.0, -1.0):
        if nc == 0:
            break
        if cap_sphere:
            d = _unit(rng.normal(size=(nc, 3)))
            cap = np.stack([d[:, 0], d[:, 1], s * (h + np.abs(d[:, 2]))], 1)
        else:
            r = np.sqrt(rng.uniform(0, 1, nc))
            a = rng.uniform(0, 2 * np.pi, nc)
            cap = np.stack([r * np.cos(a), r * np.sin(a),
                            np.full(nc, s * h)], 1)
        parts.append(cap)
    return np.concatenate(parts, 0)


def cone(rng, n, r_top=0.0):
    # lateral surface of a (possibly truncated) cone, base r=1 at z=-1,
    # top r=r_top at z=+1, plus base disk
    nb = int(n * 0.2)
    ns = n - nb
    t = rng.uniform(0, 1, ns)
    # radius shrinks with height; sample by lateral area ~ r
    t = 1 - np.sqrt(1 - t * (1 - r_top**2)) if r_top < 1 else t
    r = 1 + (r_top - 1) * t
    a = rng.uniform(0, 2 * np.pi, ns)
    side = np.stack([r * np.cos(a), r * np.sin(a), 2 * t - 1], 1)
    rb = np.sqrt(rng.uniform(0, 1, nb))
    ab = rng.uniform(0, 2 * np.pi, nb)
    base = np.stack([rb * np.cos(ab), rb * np.sin(ab), -np.ones(nb)], 1)
    return np.concatenate([side, base], 0)


def pyramid(rng, n, sides=4):
    # lateral triangles of an n-gonal pyramid + base
    nb = int(n * 0.2)
    ns = n - nb
    corners = np.stack(
        [np.cos(2 * np.pi * np.arange(sides) / sides),
         np.sin(2 * np.pi * np.arange(sides) / sides),
         -np.ones(sides)], 1
    )
    apex = np.array([0, 0, 1.0])
    face = rng.integers(0, sides, ns)
    u = rng.uniform(0, 1, ns)
    v = rng.uniform(0, 1, ns)
    flip = u + v > 1
    u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
    a = corners[face]
    b = corners[(face + 1) % sides]
    side = a + u[:, None] * (b - a) + v[:, None] * (apex - a)
    rb = np.sqrt(rng.uniform(0, 1, nb))
    ab = rng.uniform(0, 2 * np.pi, nb)
    base = np.stack([rb * np.cos(ab), rb * np.sin(ab), -np.ones(nb)], 1)
    return np.concatenate([side, base], 0)


def torus(rng, n, r_minor=0.25):
    u = rng.uniform(0, 2 * np.pi, n)
    v = rng.uniform(0, 2 * np.pi, n)
    # rejection-correct for surface area ~ (1 + r cos v)
    keep = rng.uniform(0, 1, n) < (1 + r_minor * np.cos(v)) / (1 + r_minor)
    u, v = u[keep], v[keep]
    while len(u) < n:
        u2 = rng.uniform(0, 2 * np.pi, n)
        v2 = rng.uniform(0, 2 * np.pi, n)
        k2 = rng.uniform(0, 1, n) < (1 + r_minor * np.cos(v2)) / (1 + r_minor)
        u = np.concatenate([u, u2[k2]])
        v = np.concatenate([v, v2[k2]])
    u, v = u[:n], v[:n]
    r = 1 + r_minor * np.cos(v)
    return np.stack([r * np.cos(u), r * np.sin(u), r_minor * np.sin(v)], 1)


def washer(rng, n, r_in=0.5):
    # flat annulus (two faces + rims)
    r = np.sqrt(rng.uniform(r_in**2, 1, n))
    a = rng.uniform(0, 2 * np.pi, n)
    z = rng.choice([-0.06, 0.06], n)
    return np.stack([r * np.cos(a), r * np.sin(a), z], 1)


def disk(rng, n):
    r = np.sqrt(rng.uniform(0, 1, n))
    a = rng.uniform(0, 2 * np.pi, n)
    z = rng.choice([-0.06, 0.06], n)
    return np.stack([r * np.cos(a), r * np.sin(a), z], 1)


def dumbbell(rng, n, bar=True):
    nb = int(n * 0.2) if bar else 0
    ns = (n - nb) // 2
    s1 = 0.55 * _unit(rng.normal(size=(ns, 3)))
    s2 = 0.55 * _unit(rng.normal(size=(n - nb - ns, 3)))
    s1[:, 2] -= 0.9
    s2[:, 2] += 0.9
    parts = [s1, s2]
    if bar:
        th = rng.uniform(0, 2 * np.pi, nb)
        z = rng.uniform(-0.9, 0.9, nb)
        parts.append(np.stack([0.15 * np.cos(th), 0.15 * np.sin(th), z], 1))
    return np.concatenate(parts, 0)


def helix(rng, n, turns=2):
    t = rng.uniform(0, 1, n)
    a = 2 * np.pi * turns * t
    tube = rng.normal(size=(n, 2))
    tube = 0.12 * tube / np.maximum(np.linalg.norm(tube, axis=1, keepdims=True), 1e-9)
    p = np.stack([np.cos(a), np.sin(a), 2 * t - 1], 1)
    # offset in the normal/binormal-ish plane (cheap approximation)
    p[:, 0] += tube[:, 0] * np.cos(a)
    p[:, 1] += tube[:, 0] * np.sin(a)
    p[:, 2] += tube[:, 1]
    return p


def bars(rng, n, axes=(0, 1, 2)):
    m = len(axes)
    which = rng.integers(0, m, n)
    th = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-1, 1, n)
    p = np.empty((n, 3))
    for j, axi in enumerate(axes):
        msk = which == j
        a, b = (axi + 1) % 3, (axi + 2) % 3
        p[msk, axi] = z[msk]
        p[msk, a] = 0.15 * np.cos(th[msk])
        p[msk, b] = 0.15 * np.sin(th[msk])
    return p


def bowl(rng, n):
    d = _unit(rng.normal(size=(n, 3)))
    d[:, 2] = -np.abs(d[:, 2])
    rr = np.where(rng.uniform(0, 1, n) < 0.5, 1.0, 0.92)  # two shells
    return d * rr[:, None]


# class id -> (name, sampler(rng, n)) — confusable pairs adjacent.
# Per-class parameter ranges OVERLAP between pair members on purpose.
CLASSES = [
    ("sphere", lambda r, n: sphere(r, n, aspect=r.uniform(0.96, 1.12))),
    ("ellipsoid", lambda r, n: sphere(r, n, aspect=r.uniform(1.18, 1.45))),
    ("cube", lambda r, n: box(r, n, round_r=r.uniform(0.0, 0.08))),
    ("roundedbox", lambda r, n: box(r, n, round_r=r.uniform(0.22, 0.4))),
    ("cylinder", lambda r, n: cylinder(r, n, caps=True, h=r.uniform(0.8, 1.2))),
    ("capsule", lambda r, n: cylinder(r, n, cap_sphere=True, h=r.uniform(0.5, 0.9))),
    ("cone", lambda r, n: cone(r, n, r_top=r.uniform(0.0, 0.12))),
    ("frustum", lambda r, n: cone(r, n, r_top=r.uniform(0.35, 0.6))),
    ("pyramid", lambda r, n: pyramid(r, n, sides=4)),
    ("torus", lambda r, n: torus(r, n, r_minor=r.uniform(0.22, 0.32))),
    ("thintorus", lambda r, n: torus(r, n, r_minor=r.uniform(0.08, 0.14))),
    ("washer", lambda r, n: washer(r, n, r_in=r.uniform(0.4, 0.6))),
    ("disk", lambda r, n: disk(r, n)),
    ("dumbbell", lambda r, n: dumbbell(r, n, bar=True)),
    ("twospheres", lambda r, n: dumbbell(r, n, bar=False)),
    ("helix2", lambda r, n: helix(r, n, turns=r.uniform(1.6, 2.4))),
    ("helix4", lambda r, n: helix(r, n, turns=r.uniform(3.4, 4.6))),
    ("cross3", lambda r, n: bars(r, n, axes=(0, 1, 2))),
    ("lbar", lambda r, n: bars(r, n, axes=(0, 1))),
    ("bowl", lambda r, n: bowl(r, n)),
]


def warp(rng, p, strength):
    """Smooth random warp: sum of G random Gaussian bumps pushing radially."""
    G = rng.integers(2, 5)
    centers = rng.uniform(-1, 1, (G, 3))
    amps = rng.uniform(-strength, strength, G)
    widths = rng.uniform(0.4, 0.9, G)
    out = p.copy()
    for g in range(G):
        d2 = np.sum((p - centers[g]) ** 2, axis=1)
        out += (amps[g] * np.exp(-d2 / widths[g] ** 2))[:, None] * _unit(
            p - centers[g]
        )
    return out


def occlude(rng, p, max_frac):
    """Drop a random spherical cap (scan-style occlusion); resample to keep
    the point count."""
    d = _unit(rng.normal(size=(1, 3)))
    proj = p @ d[0]
    frac = rng.uniform(0.0, max_frac)
    thr = np.quantile(proj, 1 - frac)
    keep = proj <= thr
    if keep.sum() < len(p) // 2:
        keep = proj <= np.quantile(proj, 0.5)
    kept = p[keep]
    idx = rng.integers(0, len(kept), len(p) - len(kept))
    return np.concatenate([kept, kept[idx]], 0)


def make_cloud(rng, cls_id, hard=True):
    name, sampler = CLASSES[cls_id]
    p = sampler(rng, NPTS)
    # anisotropic scale (mild; the train loop adds its own scale aug)
    p = p * rng.uniform(0.85, 1.15, (1, 3))
    if hard:
        p = warp(rng, p, strength=rng.uniform(0.05, 0.22))
        p = occlude(rng, p, max_frac=0.35)
        p = p + rng.normal(0, 0.02, p.shape)  # jitter
        n_out = rng.integers(0, NPTS // 40)  # up to 2.5% outliers
        if n_out:
            out_idx = rng.integers(0, NPTS, n_out)
            p[out_idx] = rng.uniform(-1.2, 1.2, (n_out, 3))
    else:
        p = p + rng.normal(0, 0.01, p.shape)
    # center + unit-sphere normalize (pc_normalize convention)
    p = p - p.mean(0, keepdims=True)
    p = p / np.max(np.linalg.norm(p, axis=1))
    rng.shuffle(p)
    return p.astype(np.float32)


def write_split(rng, path, per_class, hard):
    import h5py

    M = per_class * len(CLASSES)
    data = np.empty((M, NPTS, 3), np.float32)
    label = np.empty((M, 1), np.int64)
    order = rng.permutation(M)
    i = 0
    for c in range(len(CLASSES)):
        for _ in range(per_class):
            data[order[i]] = make_cloud(rng, c, hard)
            label[order[i], 0] = c
            i += 1
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data)
        f.create_dataset("label", data=label)


def _rand_rotation(rng):
    """Uniform SO(3) rotation (QR of a Gaussian, det fixed)."""
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def _clutter(rng, n):
    """Scan-style background: a ground-plane patch under the object plus
    a random wall/shelf fragment (ScanObjectNN's objects come with attached
    background from the scene segmentation — ref data.py:306-315's hard
    files; the easy/hard contrast is rotation+scale perturbation ON TOP of
    that clutter)."""
    n_plane = n * 2 // 3
    plane = np.empty((n_plane, 3))
    plane[:, 0] = rng.uniform(-1.2, 1.2, n_plane)
    plane[:, 2] = rng.uniform(-1.2, 1.2, n_plane)
    plane[:, 1] = rng.uniform(-1.05, -0.9, n_plane)  # under the object
    frag = np.empty((n - n_plane, 3))
    d = _unit(rng.normal(size=(1, 3)))
    span = rng.uniform(0.3, 0.8)
    frag[:, :] = rng.uniform(-span, span, (n - n_plane, 3))
    frag -= (frag @ d[0])[:, None] * d  # flatten onto a random plane
    frag += d * rng.uniform(0.9, 1.3)  # push to the side
    return np.concatenate([plane, frag], 0)


def make_scan_cloud(rng, cls_id):
    """ScanObjectNN-hard analogue: hard object + background clutter, then
    a BAKED-IN perturbed rotation and scale-75 variation (the hard files
    are pre-augmented on disk — training can't undo it with --rot z, which
    is exactly what makes the hard split's binary gap the reference's
    largest: README.md:123-125)."""
    p = make_cloud(rng, cls_id, hard=True)
    n_bg = int(NPTS * rng.uniform(0.15, 0.45))
    keep = rng.permutation(NPTS)[: NPTS - n_bg]
    p = np.concatenate([p[keep], _clutter(rng, n_bg)], 0)
    p = p @ _rand_rotation(rng).T  # perturbed-rotation baked into the data
    p = p * rng.uniform(0.75, 1.0)  # scale75
    p = p - p.mean(0, keepdims=True)
    p = p / np.max(np.linalg.norm(p, axis=1))
    rng.shuffle(p)
    return p.astype(np.float32)


def write_scan_split(rng, path, per_class):
    import h5py

    nc = 15  # ScanObjectNNCls.num_classes
    M = per_class * nc
    data = np.empty((M, NPTS, 3), np.float32)
    label = np.empty((M,), np.int64)
    order = rng.permutation(M)
    i = 0
    for c in range(nc):
        for _ in range(per_class):
            data[order[i]] = make_scan_cloud(rng, c)
            label[order[i]] = c
            i += 1
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data)
        f.create_dataset("label", data=label)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/synth_v2")
    ap.add_argument("--train", type=int, default=2400)
    ap.add_argument("--test", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--easy", action="store_true",
                    help="round-2-style mild corruption (saturates)")
    ap.add_argument("--scan-hard", action="store_true",
                    help="ScanObjectNN-hard analogue instead: 15 classes, "
                         "background clutter, BAKED-IN perturbed rotation + "
                         "scale75; writes the h5_files/main_split layout "
                         "the unmodified ScanObjectNNCls loader consumes "
                         "(--dataset scanobjectnn --subset hard)")
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    if args.scan_hard:
        d = os.path.join(args.out, "h5_files", "main_split")
        os.makedirs(d, exist_ok=True)
        write_scan_split(
            rng, os.path.join(d, "training_objectdataset_augmentedrot_scale75.h5"),
            args.train // 15)
        write_scan_split(
            rng, os.path.join(d, "test_objectdataset_augmentedrot_scale75.h5"),
            args.test // 15)
        print(f"wrote {args.train // 15 * 15} train / {args.test // 15 * 15} "
              f"test scan-hard clouds, 15 classes -> {d}")
        return
    d = os.path.join(args.out, "modelnet40_ply_hdf5_2048")
    os.makedirs(d, exist_ok=True)
    nc = len(CLASSES)
    write_split(rng, os.path.join(d, "ply_data_train0.h5"),
                args.train // nc, not args.easy)
    write_split(rng, os.path.join(d, "ply_data_test0.h5"),
                args.test // nc, not args.easy)
    print(f"wrote {args.train // nc * nc} train / {args.test // nc * nc} test "
          f"clouds, {nc} classes -> {d}")


if __name__ == "__main__":
    main()
