"""Central parameter registry (gpboost_tpu/config.py): alias resolution,
validation, and docs-schema consistency (the reference's
helpers/parameter_generator.py codegen invariant)."""
import os

import numpy as np
import pytest

from gpboost_tpu import config as cfg


def test_docs_match_schema():
    path = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                        "PARAMETERS.md")
    with open(path) as f:
        on_disk = f.read()
    assert on_disk == cfg.generate_markdown(), (
        "docs/PARAMETERS.md is stale: run `python -m gpboost_tpu.config`")


def test_alias_resolution():
    out = cfg.resolve_params({"n_estimators": 50, "eta": 0.05,
                              "min_child_samples": 3})
    assert out == {"num_iterations": 50, "learning_rate": 0.05,
                   "min_data_in_leaf": 3}


def test_canonical_wins_over_alias():
    out = cfg.resolve_params({"num_iterations": 10, "n_estimators": 99})
    assert out["num_iterations"] == 10


def test_validation_rejects_bad_values():
    with pytest.raises(ValueError, match="constraint"):
        cfg.resolve_params({"learning_rate": -0.1})
    with pytest.raises(ValueError, match="constraint"):
        cfg.resolve_params({"bagging_fraction": 1.5})
    with pytest.raises(ValueError, match="type"):
        cfg.resolve_params({"num_leaves": "many"})


def test_unknown_params_pass_through():
    out = cfg.resolve_params({"my_custom_key": 7})
    assert out == {"my_custom_key": 7}


def test_booster_uses_registry():
    import gpboost_tpu as gpb
    rng = np.random.default_rng(0)
    X = rng.normal(size=(100, 2))
    y = X[:, 0] + 0.1 * rng.normal(size=100)
    ds = gpb.Dataset(X, label=y)
    b = gpb.train({"n_estimators": 3, "eta": 0.3, "min_child_samples": 5,
                   "verbose": -1}, ds)
    assert b.current_iteration() == 3
    assert b.learning_rate == 0.3
    with pytest.raises(ValueError):
        gpb.train({"learning_rate": -1.0}, ds, num_boost_round=1)


def test_gpmodel_set_optim_params_validates():
    import gpboost_tpu as gpb
    gp = gpb.GPModel(group_data=np.arange(20) % 4)
    with pytest.raises(ValueError):
        gp.set_optim_params({"maxit": -5})
    gp.set_optim_params({"maxit": 7})
    assert gp.optim_cfg.maxit == 7
