"""Dataset tests with synthetic on-disk fixtures (no external downloads)."""

import pickle

import numpy as np
import pytest

from opticalflowdiffusion_tpu.config import Config
from opticalflowdiffusion_tpu.data import flow_io


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.standard_normal((7, 9, 2)).astype(np.float32)
    p = tmp_path / "x.flo"
    flow_io.write_flo(p, flow)
    got = flow_io.read_flo(p)
    np.testing.assert_array_equal(got, flow)


def test_native_flo_decode(tmp_path, rng):
    from opticalflowdiffusion_tpu.data import native

    flow = rng.standard_normal((5, 6, 2)).astype(np.float32)
    p = tmp_path / "x.flo"
    flow_io.write_flo(p, flow)
    got = native.decode_flo(open(p, "rb").read())
    np.testing.assert_array_equal(got, flow)


def test_native_matches_python_artificial(rng):
    from opticalflowdiffusion_tpu.data import native
    from opticalflowdiffusion_tpu.data.artificial import ArtificialDataset

    cfg = Config(dict(image_size=16, size=32, shape="boxes", bg="checkers", seed=3))
    ds = ArtificialDataset(cfg)
    import os

    # python reference path
    os.environ["OFD_DISABLE_NATIVE"] = "1"
    try:
        import opticalflowdiffusion_tpu.data.native as nat

        nat._tried = False
        nat._lib = None
        py = [ds[i] for i in range(4)]
    finally:
        del os.environ["OFD_DISABLE_NATIVE"]
        nat._tried = False
        nat._lib = None
    if not native.available():
        pytest.skip("native lib unavailable")
    for i in range(4):
        nat_out = ds[i]
        for a, b in zip(py[i], nat_out):
            np.testing.assert_allclose(a, b, atol=1e-6)


def test_cifar10_reader(tmp_path, rng):
    from opticalflowdiffusion_tpu.data.cifar10 import CIFAR10Dataset

    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    for name, n in [("data_batch_1", 20), ("test_batch", 10)]:
        data = {
            b"data": (rng.random((n, 3072)) * 255).astype(np.uint8),
            b"labels": list(rng.integers(0, 10, n)),
        }
        with open(base / name, "wb") as f:
            pickle.dump(data, f)
    for i in range(2, 6):
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump(
                {b"data": np.zeros((1, 3072), np.uint8), b"labels": [0]}, f
            )

    cfg = Config(dict(name="cifar10", root=str(tmp_path)))
    train = CIFAR10Dataset(cfg, "training")
    img, label = train[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    val = CIFAR10Dataset(cfg, "validation")
    assert len(val) == 10


def test_taichi_dataset(tmp_path, rng):
    from PIL import Image

    from opticalflowdiffusion_tpu.data.taichi import TaiChiDataset

    base = tmp_path / "taichi" / "taichi"
    for split in ("training", "test"):
        vid = base / split / "vid0"
        vid.mkdir(parents=True)
        for i in range(8):
            arr = (rng.random((12, 12, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(vid / f"{i:04d}.png")
        # flow cache mirror
        flows = base / f"{split}-flows2" / "vid0"
        flows.mkdir(parents=True)
        for i in range(8):
            np.save(
                flows / f"{i:04d}.png.npy",
                rng.standard_normal((8, 8, 2)).astype(np.float32),
            )

    cfg = Config(dict(
        name="taichi", image_size=8, scale_down=1.0, frame_distance=2,
        val_length=2, calculate_flows=False, root=str(tmp_path),
    ))
    train = TaiChiDataset(cfg, "training")
    item = train[0]
    assert item.shape == (8, 8, 8)  # [target3, last3, flow2]
    val = TaiChiDataset(cfg, "validation")
    vitem = val[0]
    assert vitem.shape == (2, 8, 8, 8)


def test_sintel_scan(tmp_path, rng):
    import cv2

    from opticalflowdiffusion_tpu.data.sintel import SintelDataset

    base = tmp_path / "MPI_Sintel" / "training"
    clean = base / "clean" / "alley_1"
    flowd = base / "flow" / "alley_1"
    clean.mkdir(parents=True)
    flowd.mkdir(parents=True)
    for i in range(1, 13):
        img = (rng.random((16, 32, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(clean / f"frame_{i:04d}.png"), img)
    for i in range(2, 12):
        flow_io.write_flo(
            flowd / f"frame_{i:04d}.flo",
            rng.standard_normal((16, 32, 2)).astype(np.float32),
        )

    cfg = Config(dict(name="sintel", image_size="32,16", root=str(tmp_path)))
    train = SintelDataset(cfg, "training")
    val = SintelDataset(cfg, "validation")
    assert len(train) > 0 and len(val) > 0
    f1, f2, f3, flow = train[0]
    assert f1.shape == (16, 32, 3)
    assert flow.shape == (16, 32, 2)


def test_sintel_dat_protocol(tmp_path, rng):
    """The reference-parity Sintel.dat/Sintel_split.dat index path
    (reference sintel.py:16-46): rows are '<png_tmpl> <flo_tmpl> <num>'
    with a 7-char path prefix stripped and %-formatted frame numbers;
    split file marks 1=training / 2=validation."""
    import cv2

    from opticalflowdiffusion_tpu.data.sintel import SintelDataset

    base = tmp_path / "MPI_Sintel"
    clean = base / "training" / "clean" / "alley_1"
    flowd = base / "training" / "flow" / "alley_1"
    clean.mkdir(parents=True)
    flowd.mkdir(parents=True)
    for i in range(1, 7):
        img = (rng.random((16, 32, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(clean / f"frame_{i:04d}.png"), img)
        flow_io.write_flo(
            flowd / f"frame_{i:04d}.flo",
            np.full((16, 32, 2), float(i), np.float32),
        )

    # 7-char prefix ("Sintel/") stripped by the [7:] slice, as the reference
    png_t = "Sintel/training/clean/alley_1/frame_%04d.png"
    flo_t = "Sintel/training/flow/alley_1/frame_%04d.flo"
    rows = [(png_t, flo_t, n) for n in (2, 3, 4, 5)]
    (base / "Sintel.dat").write_text(
        "".join(f"{p} {f} {n}\n" for p, f, n in rows)
    )
    (base / "Sintel_split.dat").write_text("1 x\n2 x\n1 x\n3 x\n")

    cfg = Config(dict(name="sintel", image_size="32,16", root=str(tmp_path)))
    train = SintelDataset(cfg, "training")
    val = SintelDataset(cfg, "validation")
    assert len(train) == 2  # rows 0 and 2 (marked '1')
    assert len(val) == 1    # row 1 (marked '2'); '3' belongs to neither
    # row 0 -> frame_num 2: frames 1,2,3 + flow 2
    assert train.split_paths[0][0].endswith("frame_0001.png")
    assert train.split_paths[0][1].endswith("frame_0002.png")
    assert train.split_paths[0][2].endswith("frame_0003.png")
    assert train.split_paths[0][3].endswith("frame_0002.flo")

    f1, f2, f3, flow = train[0]
    assert f1.shape == (16, 32, 3) and flow.shape == (16, 32, 2)
    np.testing.assert_allclose(flow, 2.0)  # flow file content for frame 2
    _, _, _, vflow = val[0]
    np.testing.assert_allclose(vflow, 3.0)


def test_mnist_reader(tmp_path, rng):
    import struct

    from opticalflowdiffusion_tpu.data.mnist import MNISTDataset

    base = tmp_path / "MNIST"
    base.mkdir()
    imgs = (rng.random((5, 28, 28)) * 255).astype(np.uint8)
    labels = rng.integers(0, 10, 5).astype(np.uint8)
    with open(base / "train-images-idx3-ubyte", "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, 3))
        f.write(struct.pack(">III", 5, 28, 28))
        f.write(imgs.tobytes())
    with open(base / "train-labels-idx1-ubyte", "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, 1))
        f.write(struct.pack(">I", 5))
        f.write(labels.tobytes())

    cfg = Config(dict(name="mnist", root=str(tmp_path)))
    ds = MNISTDataset(cfg, "training")
    img, lab = ds[0]
    assert img.shape == (28, 28, 1)
    assert int(lab) == int(labels[0])


def test_kitti_png_decode(tmp_path):
    import cv2

    from opticalflowdiffusion_tpu.data.flow_io import read_kitti_png

    u = np.full((4, 5), 1.5, np.float32)
    v = np.full((4, 5), -2.25, np.float32)
    valid = np.ones((4, 5), np.uint16)
    enc = np.stack(
        [(u * 64 + 2 ** 15).astype(np.uint16), (v * 64 + 2 ** 15).astype(np.uint16), valid],
        axis=-1,
    )
    p = tmp_path / "f.png"
    cv2.imwrite(str(p), enc[..., ::-1])  # store as BGR
    flow, val = read_kitti_png(p)
    np.testing.assert_allclose(flow[..., 0], 1.5)
    np.testing.assert_allclose(flow[..., 1], -2.25)
    assert val.all()
