"""Native-layout fixture trees (data/fixtures.py) + the 3-frame -> pair
batch adapter (algorithms/base.py::pair_batch) the dress rehearsal
(debug/dress_rehearsal.py) relies on."""

import numpy as np
import jax
import pytest

from opticalflowdiffusion_tpu.config import Config
from opticalflowdiffusion_tpu.data import fixtures


def test_render_sequence_flow_is_exact_motion(rng):
    r = np.random.default_rng(3)
    frames, flows = fixtures.render_sequence(r, 64, 48, 4, n_boxes=2,
                                             max_motion=4)
    assert len(frames) == 4 and len(flows) == 3
    # exact integer motion: every moving pixel whose destination carries the
    # SAME flow vector next frame (same box, not occluded by a top box)
    # must find its exact color there — no resampling blur
    checked = 0
    for t in range(3):
        fl = flows[t]
        ys, xs = np.nonzero(np.abs(fl).sum(-1) > 0)
        for y, x in zip(ys, xs):
            dx, dy = int(fl[y, x, 0]), int(fl[y, x, 1])
            ty, tx = y + dy, x + dx
            if not (0 <= ty < 48 and 0 <= tx < 64):
                continue
            if np.array_equal(flows[min(t + 1, 2)][ty, tx], fl[y, x]):
                np.testing.assert_array_equal(frames[t][y, x],
                                              frames[t + 1][ty, tx])
                checked += 1
    assert checked > 100  # the check actually exercised box pixels


def test_sintel_fixture_loads_through_production_loader(tmp_path):
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from opticalflowdiffusion_tpu.data.sintel import SintelDataset

    fixtures.make_sintel_fixture(tmp_path, scenes=1, frames=5,
                                 size=(128, 64))
    cfg = Config(dict(image_size="64,32", root=str(tmp_path), name="sintel"))
    ds = SintelDataset(cfg, split="training")
    assert len(ds) > 0
    f1, f2, f3, flow = ds[0]
    assert f1.shape == (32, 64, 3) and flow.shape == (32, 64, 2)


def test_kitti_fixture_roundtrip_and_loader(tmp_path):
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from opticalflowdiffusion_tpu.data.flow_io import read_kitti_png
    from opticalflowdiffusion_tpu.data.kitti_single import KittiSingleDataset

    fixtures.make_kitti_fixture(tmp_path, n=2, size=(96, 64))
    p = tmp_path / "KITTI" / "train" / "training" / "flow_occ" / "000000_10.png"
    flow, valid = read_kitti_png(p)
    assert flow.shape == (64, 96, 2) and valid.dtype == bool
    assert 0 < valid.mean() < 1  # sparse GT
    cfg = Config(dict(image_size="96,64", root=str(tmp_path),
                      name="kitti_single"))
    ds = KittiSingleDataset(cfg, split="training")
    img1, img2, dense = ds[0]
    assert dense.shape == (64, 96, 2)
    assert np.isfinite(dense).all()  # inpaint densified


def test_chairs_fixture_loads_through_production_loader(tmp_path):
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from opticalflowdiffusion_tpu.data.flying_chairs import FlyingChairsDataset

    fixtures.make_chairs_fixture(tmp_path, n=4, size=(96, 64))
    cfg = Config(dict(image_size="48,32", root=str(tmp_path),
                      name="flying_chairs"))
    ds = FlyingChairsDataset(cfg, split="training")
    assert len(ds) == 3  # 1 of 4 held out by the split file
    img1, img2, flow = ds[0]
    assert img1.shape == (32, 48, 3) and flow.shape == (32, 48, 2)


def test_pair_batch_adapts_sintel_three_frame_tuples(rng):
    """FlowDiffuser consumes Sintel's (f1, f2, f3, flow) 4-tuples through
    pair_batch — the reference crashes on this path (flow_diffuser.py:140
    unpacks 3; its Sintel.__getitem__ never ran un-hardcoded)."""
    from opticalflowdiffusion_tpu.algorithms.base import pair_batch
    from opticalflowdiffusion_tpu.algorithms.flow_diffuser import FlowDiffuser
    from opticalflowdiffusion_tpu.config import compose

    b = 2
    f = lambda c: rng.standard_normal((b, 16, 16, c)).astype(np.float32)
    batch4 = (f(3), f(3), f(3), f(2))
    img, tgt, flow = pair_batch(batch4)
    assert img is batch4[1] and tgt is batch4[2] and flow is batch4[3]
    assert pair_batch(batch4[1:]) == batch4[1:]

    cfg = compose([
        "experiment=matrix_flow", "dataset=artificial",
        "algorithm=flow_diffuser", "algorithm.image_size=16",
        "algorithm.timesteps=4", "algorithm.flow_max=2",
        "+algorithm.unet_dim=8",
    ])
    algo = FlowDiffuser(cfg.algorithm)
    key = jax.random.PRNGKey(0)
    state = algo.init(key, batch4)
    loss, _ = jax.jit(algo.loss_fn)(state.params, batch4, key)
    assert np.isfinite(float(loss))
