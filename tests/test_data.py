"""Data pipeline tests on a synthetic Mayo-2020/2016 directory tree:
HU windowing, paired augmentation lockstep, filename pairing, dose labels,
and the loader."""

import os

import numpy as np
import pytest

from founddiff_tpu.data import (
    Loader,
    Mayo16Dataset,
    Normalize,
    PDFDataset,
    cycle,
    define_label,
    make_paired_transforms,
)


def _write_tree(root, phase="train512", n=6, size=16):
    """Synthetic Mayo-2020 tree with the reference's naming scheme:
    <root>/Mayo2020_<anat>_2d/<phase>/<dose_dir>/<anat>-...-<idx>.npy"""
    rng = np.random.RandomState(0)
    anat_dirs = {
        "ab": "Mayo2020_ab_2d",
        "lung": "Mayo2020_lung_2d",
        "head": "Mayo2020_head_2d_2",
    }
    for anat, d in anat_dirs.items():
        for dose_dir in ["full_1mm", "sim-0.50", "sim-0.25", "sim-0.10",
                         "sim-0.17", "quarter_1mm"]:
            p = os.path.join(root, d, phase, dose_dir)
            os.makedirs(p, exist_ok=True)
            for i in range(n):
                if dose_dir == "full_1mm":
                    name = f"{anat}-full_1mm-{i}.npy"
                elif dose_dir == "quarter_1mm":
                    name = f"{anat}-quarter_1mm-{i}.npy"
                else:
                    name = f"{anat}-sim-{dose_dir.split('-')[1]}-{i}.npy"
                # HU-ish values around water (1024 offset)
                np.save(
                    os.path.join(p, name),
                    (1024 + 200 * rng.randn(size, size)).astype(np.float32),
                )


def test_hu_normalize():
    n = Normalize()
    m = np.array([[24.0, 1024.0, 3024.0, 100000.0]])
    out = n(m)
    # 24 HU-raw -> -1000 HU -> 0.0; 1024 -> 0 HU -> 1/3; 3024 -> 2000 -> 1.0
    np.testing.assert_allclose(out, [[0.0, 1.0 / 3.0, 1.0, 1.0]], rtol=1e-6)


def test_define_label():
    assert define_label("/x/full_1mm/ab-1.npy") == 1
    assert define_label("/x/quarter_1mm/ab-1.npy") == 4
    assert define_label("/x/quarter_1mm/lung-1.npy") == 10  # reference quirk
    assert define_label("/x/sim-0.10/head-sim-0.10-3.npy") == 10
    assert define_label("/x/sim-0.05/ab-sim-0.05-3.npy") == 20


def test_paired_transforms_lockstep():
    t1, t2 = make_paired_transforms(train=True)
    rng = np.random.RandomState(0)
    base = (1024 + 500 * rng.rand(1, 8, 8)).astype(np.float32)
    for _ in range(5):
        a = t1(base.copy())
        b = t2(base.copy())
        np.testing.assert_array_equal(a, b)  # identical geometry per step


def test_pdf_dataset(tmp_path):
    root = str(tmp_path)
    _write_tree(root, "train512")
    ds = PDFDataset("train512", root=root, doses=(2, 4, 6, 10), num=100, stride=1)
    # 3 anatomies x 4 doses x 6 slices
    assert len(ds) == 72
    ndct, ldct = ds[0]
    assert ndct.shape == (16, 16, 1) and ldct.shape == (16, 16, 1)
    assert ndct.dtype == np.float32
    assert 0.0 <= ndct.min() and ndct.max() <= 1.0
    # subset reproducing the reference's shipped head-only list
    ds2 = PDFDataset("train512", root=root, subset="head_1_10", num=100)
    assert len(ds2) == 6
    assert ds2.dose_label(0) == 10


def test_pdf_dataset_pairing_assert(tmp_path):
    root = str(tmp_path)
    _write_tree(root, "test")
    ds = PDFDataset("test", root=root, doses=(10,), num=100, stride=1)
    for i in range(len(ds)):
        ndct, ldct = ds[i]  # should not raise the pairing assertion
        assert ndct.shape == ldct.shape


def test_mayo16_dataset(tmp_path):
    root = str(tmp_path)
    for sub in ["quarter_1mm", "full_1mm"]:
        p = os.path.join(root, "Mayo2016_2d", "test", sub)
        os.makedirs(p)
        for i in range(4):
            np.save(
                os.path.join(p, f"mayo16-{sub}-{i}.npy"),
                np.full((8, 8), 1024.0, np.float32),
            )
    ds = Mayo16Dataset("test", root=root)
    assert len(ds) == 4
    f, q = ds[1]
    np.testing.assert_allclose(f, 1.0 / 3.0, rtol=1e-5)


def test_loader_batches(tmp_path):
    root = str(tmp_path)
    _write_tree(root, "train512")
    ds = PDFDataset("train512", root=root, doses=(2,), num=100, stride=1)
    loader = Loader(ds, batch_size=4, shuffle=True, seed=1, prefetch=2)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    ndct, ldct = batches[0]
    assert ndct.shape == (4, 16, 16, 1)
    # cycle() keeps yielding
    it = cycle(Loader(ds, batch_size=4, shuffle=False))
    for _ in range(10):
        b = next(it)
    assert b[0].shape[0] == 4
