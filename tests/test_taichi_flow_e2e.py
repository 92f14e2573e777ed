"""End-to-end TaiChi flow-supervision chain (VERDICT r1 #6 done-criterion):
train a flow-model artifact, point the TaiChi precompute at it, and check
the cached flows beat the zero-flow baseline on a synthetic fixture with
known ground truth.

Reference pipeline being evidenced: taichi.py:97-123 (pretrained-RAFT flow
precompute -> <split>-flows2 cache trusted as GT by downstream training).
"""

import importlib

import numpy as np
import pytest

from opticalflowdiffusion_tpu.config import Config


def _write_taichi_fixture(root, pairs):
    """Write (first, second) frame pairs as 2-frame 'videos' under
    <root>/taichi/training/vid_k/{0,1}.png (frame_distance=1 pairing)."""
    from PIL import Image

    base = root / "taichi" / "taichi" / "training"
    for k, (first, second) in enumerate(pairs):
        vid = base / f"vid_{k:03d}"
        vid.mkdir(parents=True)
        for j, frame in enumerate((first, second)):
            arr = np.clip(frame * 255.0, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(vid / f"{j}.png")
    return base


@pytest.mark.slow
def test_flow_pretrain_artifact_drives_taichi_precompute(tmp_path,
                                                         monkeypatch):
    monkeypatch.setenv("OFD_ARTIFACT_ROOT", str(tmp_path / "artifacts"))
    import opticalflowdiffusion_tpu.utils.ckpt as ckpt

    importlib.reload(ckpt)

    from opticalflowdiffusion_tpu.data.artificial import ArtificialDataset
    from opticalflowdiffusion_tpu.data.taichi import TaiChiDataset
    from opticalflowdiffusion_tpu.training.flow_pretrain import (
        train_flow_model,
    )

    # 64^2: RAFT works on the 1/8-res feature grid with a 4-level
    # correlation pyramid, so the grid must be >= 8x8
    size = 64
    # 1. train + publish the flow artifact (the reference's raft_large
    # surrogate, training/flow_pretrain.py)
    res = train_flow_model(
        steps=250, image_size=size, batch=8, iters=4, dataset_size=128,
        out_dir=str(tmp_path / "flow_run"), artifact="raft-e2e-test",
        log_every=100,
    )
    assert res["epe"] < res["epe_init"], res
    # the global mean is background-dominated (zero-flow EPE ~0.1 px); the
    # load-bearing bar is the moving-pixel split
    assert res["epe_moving"] < 0.5 * res["zero_flow_epe_moving"], res

    # 2. synthetic TaiChi tree from ArtificialDataset pairs (exact GT flow)
    ds = ArtificialDataset(
        Config(dict(image_size=size, size=12, shape="boxes", bg="checkers",
                    seed=3))
    )
    pairs, gt_flows = [], {}
    for i in range(len(ds)):
        first, second, flow = ds[i]
        pairs.append((first, second))
        gt_flows[f"vid_{i:03d}"] = flow
    _write_taichi_fixture(tmp_path / "data", pairs)

    # 3. precompute flows through the production TaiChiDataset path
    tds = TaiChiDataset(
        Config(dict(
            name="taichi", image_size=size, frame_distance=1,
            root=str(tmp_path / "data"), calculate_flows=True,
            flow_method="raft", flow_checkpoint="raft-e2e-test",
            flow_batch_size=8,
        )),
        split="training",
    )

    # 4. the cached flows the dataset now serves beat zero-flow vs exact GT
    # on the pixels that actually move
    errs, zero = [], []
    for i in range(len(tds)):
        item = tds[i]
        assert item.shape == (size, size, 8)
        vid = tds.first_frames[i].split("/")[-2]
        gt = gt_flows[vid]
        cached = item[..., 6:8]
        err = np.linalg.norm(cached - gt, axis=-1)
        gmag = np.linalg.norm(gt, axis=-1)
        moving = gmag > 0.5
        if moving.any():
            errs.append(err[moving].mean())
            zero.append(gmag[moving].mean())
    epe, zero_epe = float(np.mean(errs)), float(np.mean(zero))
    assert epe < 0.5 * zero_epe, (epe, zero_epe)
