"""Covariance assembly for random-effects models.

Builds the total random-effects covariance Sigma_total = sum_c Z_c Sigma_c Z_c'
from the model components — the TPU-native analog of ``RECompGroup::AddSigma``/
``RECompGP`` covariance construction (``include/GPBoost/re_comp.h:219,778``).

TPU design notes: grouped random effects never materialize a sparse incidence
matrix Z; the one-hot structure collapses to an equality mask
``codes[i] == codes[j]`` fused into the covariance sum (dense path) or to
``jax.ops.segment_sum`` (Woodbury path, see ``woodbury.py``). Everything is
dense, statically shaped, and differentiable.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from gpboost_tpu.models.spec import GPRESpec, GroupedRESpec, ModelData, ModelSpec
from gpboost_tpu.ops.cov_fns import euclidean_distance


def _grouped_cross_cov(codes1, codes2, z1=None, z2=None):
    eq = (codes1[:, None] == codes2[None, :]).astype(jnp.result_type(float))
    if z1 is not None:
        eq = eq * (z1[:, None] * z2[None, :])
    return eq


def component_cov(spec: ModelSpec, comp, pars: jnp.ndarray, data: ModelData,
                  grouped_idx: int, gp_idx: int,
                  data2: Optional[ModelData] = None,
                  cross_dists: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Covariance contribution of one component.

    If ``data2`` is given, computes the cross-covariance between data2 (rows,
    e.g. prediction points) and data (columns); otherwise the symmetric matrix
    on ``data``.
    """
    d2 = data if data2 is None else data2
    if isinstance(comp, GroupedRESpec):
        c1 = d2.group_codes[:, comp.code_col]
        c2 = data.group_codes[:, comp.code_col]
        z1 = z2 = None
        if comp.is_slope:
            z1 = d2.slope_data[:, comp.slope_data_idx]
            z2 = data.slope_data[:, comp.slope_data_idx]
        return pars[0] * _grouped_cross_cov(c1, c2, z1, z2)
    assert isinstance(comp, GPRESpec)
    cf = comp.cov_fn
    if cf.is_isotropic:
        if data2 is None:
            dist = data.dists if data.dists is not None else euclidean_distance(
                data.coords, data.coords)
        else:
            dist = cross_dists if cross_dists is not None else euclidean_distance(
                d2.coords, data.coords)
        cov = cf.cov_matrix(pars, dist=dist)
    else:
        cov = cf.cov_matrix(pars, coords1=d2.coords if data2 is not None else data.coords,
                            coords2=data.coords)
    if comp.is_random_coef:
        z1 = d2.gp_rand_coef_data[:, comp.rand_coef_data_idx]
        z2 = data.gp_rand_coef_data[:, comp.rand_coef_data_idx]
        cov = cov * (z1[:, None] * z2[None, :])
    return cov


def total_re_cov(spec: ModelSpec, data: ModelData, cov_pars_comps: Sequence[jnp.ndarray],
                 data2: Optional[ModelData] = None,
                 cross_dists: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Sum of all component covariances (no error/nugget term).

    ``cov_pars_comps`` is the per-component parameter list produced by
    ``split_cov_pars``.
    """
    total = None
    gi = 0
    gpi = 0
    for comp, pars in zip(spec.components, cov_pars_comps):
        cov = component_cov(spec, comp, pars, data, gi, gpi, data2, cross_dists)
        total = cov if total is None else total + cov
        if isinstance(comp, GroupedRESpec):
            gi += 1
        else:
            gpi += 1
    if data.cluster_codes is not None:
        # independent realizations per cluster_id: zero cross-cluster entries
        # (the reference holds per-cluster blocks in std::maps,
        #  re_model_template.h:5020-5144; here Psi is block-diagonal by mask)
        c2 = data.cluster_codes
        c1 = c2 if data2 is None else data2.cluster_codes
        mask = (c1[:, None] == c2[None, :]).astype(total.dtype)
        total = total * mask
    return total


def split_cov_pars(spec: ModelSpec, cov_pars: jnp.ndarray):
    """Split the flat cov-par vector into (sigma2_error, [per-component pars]).

    Layout matches the reference (`re_model_template.h`): error variance first
    for Gaussian likelihood, then component blocks in declaration order.
    """
    comps = []
    for comp, a, b in spec.cov_par_slices():
        comps.append(cov_pars[a:b])
    sigma2 = cov_pars[0] if spec.is_gaussian else None
    return sigma2, comps
