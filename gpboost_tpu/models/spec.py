"""Model specification: static structure + array data for random-effects models.

TPU-first redesign of the reference's ``REModelTemplate`` state
(``include/GPBoost/re_model_template.h:55``): instead of an 11k-line mutable
template, the model is split into

- :class:`ModelSpec` — static, hashable structure (component types, covariance
  functions, likelihood, approximation). Safe to pass as a jit static arg.
- :class:`ModelData` — a pytree of arrays (distances, group codes, design
  matrices). Shapes are static per spec, so jitted functions compile once.
- a flat covariance-parameter vector, laid out exactly like the reference's
  ``cov_pars`` (``re_model_template.h`` / ``basic.py:4054-4095``): for Gaussian
  likelihood ``[sigma2_error, pars(comp_0), pars(comp_1), ...]``; grouped
  random effects contribute one variance each, GP components contribute
  ``CovFunction.num_cov_par`` parameters.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpboost_tpu.ops.cov_fns import CovFunction, euclidean_distance


@dataclass(frozen=True)
class GroupedRESpec:
    """A grouped random effect (random intercept or random slope).

    Mirrors ``RECompGroup`` (``include/GPBoost/re_comp.h:219``). ``num_groups``
    is static (shapes depend on it). ``is_slope`` marks random-coefficient
    (slope) effects that multiply the incidence by a covariate.
    """
    num_groups: int
    is_slope: bool = False
    # index into ModelData.re_group_rand_coef_data columns for slopes
    slope_data_idx: int = -1
    num_cov_par: int = 1
    # column of ModelData.group_codes holding this component's level codes
    # (slopes share their base intercept's column; decoupling components from
    # column position is what makes drop_intercept_group_rand_effect work,
    # re_model_template.h:69,242-266)
    code_col: int = 0


@dataclass(frozen=True)
class GPRESpec:
    """A Gaussian-process random effect (``RECompGP``, ``re_comp.h:778``)."""
    cov_fn: CovFunction
    is_random_coef: bool = False
    rand_coef_data_idx: int = -1

    @property
    def num_cov_par(self) -> int:
        return self.cov_fn.num_cov_par


@dataclass(frozen=True)
class ModelSpec:
    """Static model structure; hashable, used as a jit static argument."""
    components: Tuple[object, ...]  # GroupedRESpec | GPRESpec
    likelihood: str = "gaussian"
    num_data: int = 0
    has_covariates: bool = False
    num_coef: int = 0

    @property
    def is_gaussian(self) -> bool:
        return self.likelihood == "gaussian"

    @property
    def num_cov_par(self) -> int:
        n = 1 if self.is_gaussian else 0  # nugget / error variance first
        for c in self.components:
            n += c.num_cov_par
        return n

    def cov_par_slices(self):
        """Yield (component, start, stop) into the flat cov_par vector."""
        off = 1 if self.is_gaussian else 0
        out = []
        for c in self.components:
            out.append((c, off, off + c.num_cov_par))
            off += c.num_cov_par
        return out


@jax.tree_util.register_pytree_node_class
@dataclass
class ModelData:
    """Array data for one independent-realization cluster.

    The reference holds one of these per ``cluster_id`` in ``std::map``s
    (``re_model_template.h:5020-5394``); here clusters either share one
    ModelData (single cluster) or are batched/stacked for embarrassing
    parallelism over a mesh axis.
    """
    y: Optional[jnp.ndarray] = None            # [n]
    X: Optional[jnp.ndarray] = None            # [n, p] fixed-effect design
    group_codes: Optional[jnp.ndarray] = None  # [n, n_grouped] int32 codes
    slope_data: Optional[jnp.ndarray] = None   # [n, n_slopes] covariates
    coords: Optional[jnp.ndarray] = None       # [n, d] GP locations
    dists: Optional[jnp.ndarray] = None        # [n, n] precomputed distances
    gp_rand_coef_data: Optional[jnp.ndarray] = None  # [n, n_gp_rc]
    weights: Optional[jnp.ndarray] = None      # [n]
    cluster_codes: Optional[jnp.ndarray] = None  # [n] int32 independent blocks
    row_weight: Optional[jnp.ndarray] = None   # [n] 0/1 mesh-padding mask

    def tree_flatten(self):
        children = (self.y, self.X, self.group_codes, self.slope_data,
                    self.coords, self.dists, self.gp_rand_coef_data,
                    self.weights, self.cluster_codes, self.row_weight)
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def make_model_data(y=None, X=None, group_data=None, group_rand_coef_data=None,
                    ind_effect_group_rand_coef=None,
                    drop_intercept_group_rand_effect=None, gp_coords=None,
                    gp_rand_coef_data=None, weights=None,
                    dtype=jnp.float64) -> tuple[ModelSpec, ModelData, dict]:
    """Build (spec, data) from user-facing inputs, mirroring GPModel.__init__
    marshalling in the reference python package (``basic.py:4054-4095``).

    Returns (spec_kwargs_dict is returned for the GPModel facade to finish the
    spec with likelihood etc.).
    """
    n = None
    group_codes = None
    components = []
    group_maps = []
    if group_data is not None:
        gd = np.asarray(group_data)
        if gd.ndim == 1:
            gd = gd[:, None]
        n = gd.shape[0]
        codes = np.empty(gd.shape, dtype=np.int32)
        base_num_groups = []
        for j in range(gd.shape[1]):
            uniq, inv = np.unique(gd[:, j].astype(str), return_inverse=True)
            codes[:, j] = inv.astype(np.int32)
            group_maps.append(uniq)
            base_num_groups.append(len(uniq))
            components.append(GroupedRESpec(num_groups=len(uniq), code_col=j))
        group_codes = jnp.asarray(codes)
        slope_base_cols = []
        if group_rand_coef_data is not None:
            rc = np.asarray(group_rand_coef_data, dtype=np.float64)
            if rc.ndim == 1:
                rc = rc[:, None]
            inds = np.atleast_1d(np.asarray(ind_effect_group_rand_coef)).astype(int)
            for j in range(rc.shape[1]):
                base = int(inds[j]) - 1  # reference uses 1-based indices
                components.append(GroupedRESpec(
                    num_groups=base_num_groups[base],
                    is_slope=True, slope_data_idx=j, code_col=base))
                slope_base_cols.append(base)
        if drop_intercept_group_rand_effect is not None:
            # drop intercept random effect k (only allowed when it has at
            # least one random slope, re_model_template.h:255-266); its code
            # column and group map stay (slopes reference them via code_col)
            drop = np.atleast_1d(
                np.asarray(drop_intercept_group_rand_effect)).astype(bool)
            for k in range(gd.shape[1]):
                if k < len(drop) and drop[k]:
                    if k not in slope_base_cols:
                        raise ValueError(
                            f"Cannot drop intercept random effect number {k} "
                            "as this random effect has no corresponding "
                            "random coefficients")
            components = [c for c in components
                          if not (isinstance(c, GroupedRESpec)
                                  and not c.is_slope
                                  and c.code_col < len(drop)
                                  and drop[c.code_col])]
    coords = None
    dists = None
    if gp_coords is not None:
        c = np.asarray(gp_coords, dtype=np.float64)
        if c.ndim == 1:
            c = c[:, None]
        n = c.shape[0] if n is None else n
        coords = jnp.asarray(c, dtype=dtype)

    slope_arr = None
    if group_rand_coef_data is not None:
        rc = np.asarray(group_rand_coef_data, dtype=np.float64)
        if rc.ndim == 1:
            rc = rc[:, None]
        slope_arr = jnp.asarray(rc, dtype=dtype)
    gp_rc_arr = None
    if gp_rand_coef_data is not None:
        rc = np.asarray(gp_rand_coef_data, dtype=np.float64)
        if rc.ndim == 1:
            rc = rc[:, None]
        gp_rc_arr = jnp.asarray(rc, dtype=dtype)

    data = ModelData(
        y=None if y is None else jnp.asarray(y, dtype=dtype),
        X=None if X is None else jnp.asarray(X, dtype=dtype),
        group_codes=group_codes,
        slope_data=slope_arr,
        coords=coords,
        dists=dists,
        gp_rand_coef_data=gp_rc_arr,
        weights=None if weights is None else jnp.asarray(weights, dtype=dtype),
    )
    return components, data, {"num_data": n, "group_maps": group_maps}
