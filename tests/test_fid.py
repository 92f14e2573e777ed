"""Trained-classifier Frechet features (VERDICT r1 #9).

The reference's FID uses pretrained InceptionV3 features
(reference denoising_diffusion.py:1072-1184); here the extractor is a
trained framework classifier's penultimate layer.  Tests cover the
extractor mechanics (fast) and the full pretrain -> artifact -> trained
feature quality chain (slow).
"""

import numpy as np
import jax
import pytest


def _init_classifier_params(num_class=10):
    from opticalflowdiffusion_tpu.algorithms.classifier import Classifier
    from opticalflowdiffusion_tpu.config import Config

    algo = Classifier(Config(dict(arch="resnet18", num_class=num_class,
                                  in_channels=3, lr=1e-3)))
    batch = (np.zeros((2, 32, 32, 3), np.float32), np.zeros((2,), np.int32))
    state = algo.init(jax.random.PRNGKey(0), batch)
    return state.params


def test_classifier_feature_fn_shapes_and_adaptation():
    from opticalflowdiffusion_tpu.utils.fid import classifier_feature_fn

    fn = classifier_feature_fn(_init_classifier_params())
    # native input
    f = np.asarray(fn(np.random.default_rng(0).random((4, 32, 32, 3),
                                                      np.float32)))
    assert f.shape == (4, 512) and np.isfinite(f).all()
    # grayscale + different resolution adapt (diffusion samples are 64x64x1
    # in some configs)
    f2 = np.asarray(fn(np.zeros((3, 64, 64, 1), np.float32)))
    assert f2.shape == (3, 512)
    # extra channels (joint target = warped+flow) dropped to RGB
    f3 = np.asarray(fn(np.zeros((3, 32, 32, 5), np.float32)))
    assert f3.shape == (3, 512)


def test_fid_between_with_classifier_features():
    from opticalflowdiffusion_tpu.utils.fid import (
        classifier_feature_fn, fid_between,
    )

    fn = classifier_feature_fn(_init_classifier_params())
    rng = np.random.default_rng(1)
    a = rng.random((24, 32, 32, 3), np.float32)
    b = rng.random((24, 32, 32, 3), np.float32)
    same = fid_between(a, a, feature_fn=fn)
    diff = fid_between(a, np.clip(b + 0.4, 0, 1), feature_fn=fn)
    assert same < 1e-4
    assert diff > same


@pytest.mark.slow
def test_classifier_pretrain_trains_and_features_discriminate(tmp_path,
                                                              monkeypatch):
    """End-to-end: pretrain on the synthetic task, publish the artifact,
    rebuild the feature fn from the artifact store, and check the *trained*
    features separate distributions a random extractor confuses."""
    monkeypatch.setenv("OFD_ARTIFACT_ROOT", str(tmp_path / "artifacts"))
    import importlib
    import opticalflowdiffusion_tpu.utils.ckpt as ckpt

    importlib.reload(ckpt)

    from opticalflowdiffusion_tpu.training.classifier_pretrain import (
        synthetic_class_batch, train_classifier,
    )

    res = train_classifier(
        steps=300, batch=64, lr=2e-3,
        out_dir=str(tmp_path / "out"), artifact="classifier-feat-test",
    )
    assert res["accuracy"] > 0.5, res  # 10-class chance = 0.1

    from opticalflowdiffusion_tpu.utils.fid import (
        classifier_feature_fn, fid_between,
    )

    fn = classifier_feature_fn("classifier-feat-test")
    rng = np.random.default_rng(2)
    a1, la = synthetic_class_batch(rng, 96)
    a2, _ = synthetic_class_batch(rng, 96)
    # distribution shift: only cross shapes vs only boxes
    b, lb = synthetic_class_batch(rng, 256)
    boxes = b[lb < 5][:96]
    crosses = b[lb >= 5][:96]
    fid_same = fid_between(a1, a2, feature_fn=fn)
    fid_shift = fid_between(boxes, crosses, feature_fn=fn)
    assert fid_shift > 2.0 * fid_same, (fid_same, fid_shift)
