"""End-to-end TaiChi flow-supervision chain (VERDICT r1 #6):
train a flow-model artifact, point the TaiChi precompute at it, and check
the cache it writes is exactly the trained model's inference (chain
integrity).  RAFT *quality* (moving-pixel EPE << zero-flow) needs a
training budget far beyond a CPU test — it is produced on the TPU by
``python -m opticalflowdiffusion_tpu.training.flow_pretrain`` and recorded
in parity/PARITY_r02.md.

Reference pipeline being evidenced: taichi.py:97-123 (pretrained-RAFT flow
precompute -> <split>-flows2 cache trusted as GT by downstream training).
"""

import importlib

import numpy as np
import pytest

from opticalflowdiffusion_tpu.config import Config


def _write_taichi_fixture(root, pairs):
    """Write (first, second) frame pairs as 2-frame 'videos' under
    <root>/taichi/taichi/training/vid_k/{0,1}.png (frame_distance=1)."""
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

    # 64^2: RAFT's 1/8-res feature grid must fit the correlation pyramid
    size = 64
    # 1. train (briefly) + publish the flow artifact; the few-step budget
    # checks the optimization moves, not converged quality (see module doc)
    res = train_flow_model(
        steps=30, image_size=size, batch=4, iters=2, corr_levels=2,
        max_motion=3, dataset_size=32,
        out_dir=str(tmp_path / "flow_run"), artifact="raft-e2e-test",
        log_every=10,
    )
    assert res["epe"] < res["epe_init"], res

    # 2. synthetic TaiChi tree from ArtificialDataset pairs
    ds = ArtificialDataset(
        Config(dict(image_size=size, size=6, shape="boxes", bg="checkers",
                    seed=3))
    )
    pairs = [(ds[i][0], ds[i][1]) for i in range(len(ds))]
    _write_taichi_fixture(tmp_path / "data", pairs)

    # 3. precompute flows through the production TaiChiDataset path
    # (arch keys match the trained artifact)
    tds = TaiChiDataset(
        Config(dict(
            name="taichi", image_size=size, frame_distance=1,
            root=str(tmp_path / "data"), calculate_flows=True,
            flow_method="raft", flow_checkpoint="raft-e2e-test",
            flow_iters=2, flow_corr_levels=2, flow_batch_size=4,
        )),
        split="training",
    )

    # 4. chain integrity: the cache the dataset now serves is EXACTLY the
    # trained artifact's inference on those frame pairs — i.e. the
    # precompute really loaded the published weights with the right
    # architecture (untrained or mismatched weights would differ)
    import jax
    from opticalflowdiffusion_tpu.models.raft import RAFT
    from opticalflowdiffusion_tpu.utils.ckpt import load_params_from_run

    model = RAFT(iters=2, corr_levels=2)
    params = load_params_from_run("raft-e2e-test")
    infer = jax.jit(
        lambda f, s: model.apply({"params": params}, f, s)[-1]
    )
    checked = 0
    for i in range(len(tds)):
        item = tds[i]
        assert item.shape == (size, size, 8)
        cached = item[..., 6:8]
        assert np.isfinite(cached).all()
        first = tds._load_frame(tds.first_frames[i])
        second = tds._load_frame(tds.second_frames[i])
        want = np.asarray(infer(first[None], second[None])[0])
        np.testing.assert_allclose(cached, want, rtol=1e-4, atol=1e-5)
        checked += 1
    assert checked == len(ds)
    # and the model is not a zero-output stub
    assert float(np.abs(np.asarray(want)).max()) > 0
