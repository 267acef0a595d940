"""NG Vecchia-Laplace fit dispatch modes (models/vecchia_fit.py).

The eligible whole-fit-on-device NG fit has three dispatch granularities:
chunked device L-BFGS (a few iterations per dispatch), single dispatch,
and — past GPBOOST_TPU_NG_HOST_LS_N — a HOST linesearch (scipy L-BFGS-B)
over the same jitted device objective, bounding every device program at
ONE vg evaluation (a compiled L-BFGS iteration holds up to 31 of them,
which ran the TPU worker into its execution watchdog at n=1e5).
Reference flow: OptimLinRegrCoefCovPar driving
FindModePostRandEffCalcMLLVecchia, likelihoods.h:2765.
"""
import numpy as np
import pytest

import gpboost_tpu as gpb

N = 400


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    coords = rng.uniform(size=(N, 2))
    lat = np.sin(4 * coords[:, 0]) + np.cos(3 * coords[:, 1])
    p = 1.0 / (1.0 + np.exp(-lat))
    y = rng.binomial(1, p).astype(np.float64)
    return coords, y


def _fit(coords, y, monkeypatch, chunk_env):
    monkeypatch.setenv("GPBOOST_TPU_FORCE_DEVICE_LOOP", "1")
    monkeypatch.setenv("GPBOOST_TPU_NG_DEVICE_CHUNK", chunk_env)
    m = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=15,
                    likelihood="bernoulli_logit",
                    matrix_inversion_method="iterative")
    m.set_optim_params({"optimizer_cov": "lbfgs", "maxit": 60,
                        "init_cov_pars": [1.0, 0.2]})
    m.fit(y=y)
    nll = m.neg_log_likelihood(cov_pars=np.asarray(m.cov_pars_), y=y)
    return np.asarray(m.cov_pars_), float(nll)

def test_host_linesearch_matches_chunked_device(data, monkeypatch):
    """'host' mode (one vg per dispatch, scipy linesearch) reaches the
    same optimum as the chunked device driver — same jitted objective,
    different step control, so agreement is to optimizer tolerance."""
    coords, y = data
    cp_host, nll_host = _fit(coords, y, monkeypatch, "host")
    cp_chunk, nll_chunk = _fit(coords, y, monkeypatch, "3")
    assert abs(nll_host - nll_chunk) < 5e-3 * max(1.0, abs(nll_chunk))
    np.testing.assert_allclose(cp_host, cp_chunk, rtol=0.15)


def test_auto_threshold_routes_small_n_to_device(data, monkeypatch):
    """auto keeps small fits on the chunked device driver (n <= threshold)
    and routes large ones to the host linesearch."""
    from gpboost_tpu.models import vecchia_fit as vf
    coords, y = data
    calls = []
    orig = vf.optimizers.lbfgs_device_chunked

    def spy(*a, **k):
        calls.append("chunked")
        return orig(*a, **k)

    monkeypatch.setattr(vf.optimizers, "lbfgs_device_chunked", spy)
    monkeypatch.setenv("GPBOOST_TPU_NG_DEVICE_CHUNK", "auto")
    _fit(coords, y, monkeypatch, "auto")
    assert calls == ["chunked"]
    # force the auto threshold below n: the host path must engage
    calls.clear()
    monkeypatch.setenv("GPBOOST_TPU_NG_HOST_LS_N", str(N - 1))
    cp, nll = _fit(coords, y, monkeypatch, "auto")
    assert calls == []
    assert np.all(np.isfinite(cp)) and np.isfinite(nll)
