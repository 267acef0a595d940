"""gpboost_tpu — TPU-native gradient boosting with Gaussian process and
mixed-effects models.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of GPBoost
(TimGyger/GPBoost v1.6.5): tree boosting combined with Gaussian processes and
grouped random effects, usable standalone or combined (GPBoost / LaGaBoost
algorithms).

Double precision is enabled globally to match the reference's numerics
(``SCORE_T_USE_DOUBLE``, ``type_defs.h:29-62``); pass ``dtype=jnp.float32`` to
models for TPU-speed single precision.
"""
import jax as _jax

_jax.config.update("jax_enable_x64", True)
# Full-precision matmuls by default: covariance/solve numerics break at TPU's
# default bf16 matmul precision (non-PSD matrices -> NaN Cholesky). Hot kernels
# opt into bf16 explicitly where it is provably safe.
_jax.config.update("jax_default_matmul_precision", "float32")


def enable_compilation_cache(path: str,
                             min_compile_time_secs: float = 1.0) -> None:
    """Enable JAX's persistent compilation cache at ``path``.

    The fused Pallas / whole-fit-on-device programs take minutes to compile
    cold over a TPU tunnel but milliseconds to deserialize; enabling this
    makes the first model fit of every NEW process reuse the executables of
    previous processes (measured: 100k-point Vecchia fit 99.5 s -> 9.5 s
    process-cold). Safe to share across code versions — entries are keyed
    by the full computation fingerprint. Also honored automatically when
    the ``GPBOOST_TPU_COMPILATION_CACHE_DIR`` environment variable is set.
    """
    _jax.config.update("jax_compilation_cache_dir", path)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                       float(min_compile_time_secs))
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


import os as _os  # noqa: E402

if _os.environ.get("GPBOOST_TPU_COMPILATION_CACHE_DIR"):
    enable_compilation_cache(
        _os.environ["GPBOOST_TPU_COMPILATION_CACHE_DIR"])

from gpboost_tpu.models.gp_model import GPModel  # noqa: E402

from gpboost_tpu.boosting.dataset import Dataset  # noqa: E402
from gpboost_tpu.boosting.booster import Booster  # noqa: E402
from gpboost_tpu.boosting.engine import train, cv, CVBooster  # noqa: E402
from gpboost_tpu.boosting import callback  # noqa: E402
from gpboost_tpu.boosting.callback import (  # noqa: E402
    early_stopping, record_evaluation, print_evaluation, log_evaluation,
    reset_parameter)
from gpboost_tpu.sklearn import (  # noqa: E402
    GPBoostClassifier, GPBoostModel, GPBoostRanker, GPBoostRegressor)
from gpboost_tpu.tuning import grid_search_tune_parameters  # noqa: E402
from gpboost_tpu import plotting  # noqa: E402
from gpboost_tpu.plotting import (  # noqa: E402
    create_tree_digraph, partial_dependence_plot, plot_importance,
    plot_metric, plot_tree)
from gpboost_tpu.parallel import (  # noqa: E402
    active_mesh, make_mesh, set_mesh, use_mesh)
from gpboost_tpu import distributed  # noqa: E402
from gpboost_tpu.utils import get_nested_categories  # noqa: E402
from gpboost_tpu.utils.log import register_logger  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "GPModel", "Dataset", "Booster", "train", "cv", "CVBooster",
    "GPBoostModel", "GPBoostRegressor", "GPBoostClassifier", "GPBoostRanker",
    "grid_search_tune_parameters", "early_stopping", "record_evaluation",
    "print_evaluation", "log_evaluation", "reset_parameter",
    "plot_importance", "plot_metric", "partial_dependence_plot",
    "plot_tree", "create_tree_digraph",
    "set_mesh", "use_mesh", "active_mesh", "make_mesh", "distributed",
    "register_logger", "get_nested_categories", "enable_compilation_cache",
    "__version__",
]
