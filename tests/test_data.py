"""Data-layer unit tests: augmentations, loader semantics, pc_normalize."""

import numpy as np

from svnet_tpu.data import (
    Loader,
    jitter_pointcloud,
    pc_normalize,
    rotate_pointcloud_2d,
    translate_pointcloud,
)


class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((4, 3), float(i), dtype=np.float32), i % 5


class TestAugment:
    def test_translate_ranges(self):
        rng = np.random.default_rng(0)
        pc = np.ones((128, 3), dtype=np.float32)
        out = translate_pointcloud(pc, rng)
        assert out.shape == pc.shape and out.dtype == np.float32
        # scale in [2/3, 3/2], shift in [-0.2, 0.2] => bounds
        assert (out >= 2 / 3 - 0.2 - 1e-6).all()
        assert (out <= 3 / 2 + 0.2 + 1e-6).all()

    def test_jitter_clip(self):
        rng = np.random.default_rng(1)
        pc = np.zeros((64, 3), dtype=np.float32)
        out = jitter_pointcloud(pc, rng, sigma=0.01, clip=0.02)
        assert np.abs(out).max() <= 0.02 + 1e-7

    def test_rotate2d_preserves_y(self):
        rng = np.random.default_rng(2)
        pc = rng.standard_normal((32, 3)).astype(np.float32)
        out = rotate_pointcloud_2d(pc, rng)
        np.testing.assert_allclose(out[:, 1], pc[:, 1], rtol=1e-6)
        # xz norms preserved
        np.testing.assert_allclose(
            np.linalg.norm(out[:, [0, 2]], axis=1),
            np.linalg.norm(pc[:, [0, 2]], axis=1),
            rtol=1e-5,
        )

    def test_pc_normalize(self):
        rng = np.random.default_rng(3)
        pc = rng.standard_normal((64, 3)) * 5 + 2
        out = pc_normalize(pc)
        np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-6)
        assert abs(np.linalg.norm(out, axis=1).max() - 1.0) < 1e-6


class TestLoader:
    def test_drop_last(self):
        ld = Loader(_ToyDataset(10), batch_size=4, drop_last=True)
        batches = list(ld)
        assert len(batches) == 2
        assert all(b["points"].shape[0] == 4 for b in batches)

    def test_pad_last_masks(self):
        ld = Loader(_ToyDataset(10), batch_size=4, pad_last=True)
        batches = list(ld)
        assert len(batches) == 3
        last = batches[-1]
        assert last["points"].shape[0] == 4  # static shape
        assert last["size"] == 2 and last["pad"] == 2

    def test_shuffle_deterministic_per_seed(self):
        a = [b["target"].tolist() for b in Loader(_ToyDataset(16), 4, shuffle=True, seed=7)]
        b = [b["target"].tolist() for b in Loader(_ToyDataset(16), 4, shuffle=True, seed=7)]
        assert a == b


class TestSyntheticGenerators:
    """The egress-free benchmark generators (tools/make_synthetic*.py)
    keep producing structurally valid clouds — every partseg pid inside
    its category's ShapeNetPart part range, normalized unit-sphere
    coordinates, exact requested shapes."""

    def _tools(self):
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "make_synthetic_partseg",
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "make_synthetic_partseg.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_partseg_clouds_valid(self):
        mp = self._tools()
        rng = np.random.default_rng(0)
        for cat in range(16):
            # uncorrupted: every declared part present
            p0, pid0 = mp.make_cloud(rng, cat, hard=False)
            assert len(np.unique(pid0)) == mp.SEG_NUM[cat], cat
            # hardened: occlusion may legally remove a small part
            # (calculate_shape_IoU's empty-union => IoU=1 handles it)
            p, pid = mp.make_cloud(rng, cat, hard=True)
            assert p.shape == (mp.NPTS, 3) and p.dtype == np.float32
            assert pid.shape == (mp.NPTS,)
            lo = mp.INDEX_START[cat]
            hi = lo + mp.SEG_NUM[cat]
            assert pid.min() >= lo and pid.max() < hi
            assert len(np.unique(pid)) >= max(2, mp.SEG_NUM[cat] - 1), cat
            r = np.linalg.norm(p, axis=1)
            assert abs(r.max() - 1.0) < 1e-5 and np.isfinite(p).all()

    def _cls_tool(self):
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "make_synthetic",
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "make_synthetic.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_scan_hard_clouds_valid(self):
        """r4 ScanObjectNN-hard analogue: clutter present, rotation baked
        in, normalized unit sphere, valid 15-class labels."""
        ms = self._cls_tool()
        rng = np.random.default_rng(0)
        for c in (0, 7, 14):
            p = ms.make_scan_cloud(rng, c)
            assert p.shape == (ms.NPTS, 3) and p.dtype == np.float32
            r = np.linalg.norm(p, axis=1)
            assert abs(r.max() - 1.0) < 1e-5 and np.isfinite(p).all()
        # baked-in rotation: across instances of one class, the dominant
        # (PCA) axis direction varies — z-aligned datasets would not
        axes = []
        for _ in range(6):
            p = ms.make_scan_cloud(rng, 3)
            cov = p.T @ p
            w, v = np.linalg.eigh(cov)
            axes.append(np.abs(v[:, -1]))
        spread = np.std(np.stack(axes), axis=0)
        assert spread.max() > 0.05, spread
