"""Config composition tests: reference Hydra surface parity."""

import pytest

from opticalflowdiffusion_tpu.config import compose, Config


def test_default_composition():
    cfg = compose([])
    assert cfg.experiment.name == "matrix_flow"
    assert cfg.dataset.name == "sintel"
    assert cfg.algorithm.name == "pwc_learner"
    # base.yaml inherited values
    assert cfg.experiment.tasks == ["train"]
    assert cfg.experiment.training.data.batch_size == 16  # matrix_flow override
    assert cfg.experiment.training.clipping == 100
    assert cfg.experiment.validation.check_interval == 100


def test_group_selection_and_overrides():
    cfg = compose(
        [
            "experiment=matrix_flow",
            "dataset=artificial",
            "algorithm=flow_diffuser",
            "algorithm.lr=1e-4",
            "+wandb.name=example",
        ]
    )
    assert cfg.algorithm.name == "flow_diffuser"
    assert cfg.algorithm.lr == pytest.approx(1e-4)
    assert cfg.algorithm.timesteps == 1000
    assert cfg.algorithm.target == "joint"
    assert cfg.dataset.image_size == 32
    assert cfg.wandb.name == "example"


def test_unknown_override_rejected():
    with pytest.raises(KeyError):
        compose(["algorithm.notakey=3"])
    # but additive works
    cfg = compose(["+algorithm.notakey=3"])
    assert cfg.algorithm.notakey == 3


def test_optional_key_idiom():
    """The reference checks optional keys via `'radius' in dir(cfg)`
    (flow_learner.py:71); Config must support that."""
    cfg = Config({"radius": 9})
    assert "radius" in dir(cfg)
    assert "flow_max" not in dir(cfg)


def test_yaml_scalar_parsing():
    cfg = compose(["algorithm=flow_diffuser", "algorithm.is_diffusion=false",
                   "algorithm.flow_max=7"])
    assert cfg.algorithm.is_diffusion is False
    assert cfg.algorithm.flow_max == 7


def test_tilde_deletion_override():
    """Hydra's `~key` deletion grammar: removes a composed key (used e.g. to
    drop flow_max when selecting the filter representation via radius)."""
    cfg = compose(["algorithm=flow_learner", "~algorithm.flow_max",
                   "+algorithm.radius=3"])
    assert "flow_max" not in cfg.algorithm
    assert cfg.algorithm.radius == 3
    import pytest as _pytest
    with _pytest.raises(KeyError):
        compose(["~algorithm.notakey"])
    with _pytest.raises(ValueError):
        compose(["~algorithm.lr=3"])
