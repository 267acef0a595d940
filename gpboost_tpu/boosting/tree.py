"""Histogram-based decision tree: growth kernels + structure.

TPU-native redesign of the reference's serial tree learner
(``src/LightGBM/treelearner/serial_tree_learner.cpp:159-210`` Train loop,
``feature_histogram.hpp`` split gains, ``data_partition.hpp``): the grower is
a host-driven leaf-wise loop (tree growth is inherently data-dependent control
flow — SURVEY §7 "hard parts"), but every O(n) operation is a jitted
statically-shaped device kernel:

- histogram build: vmapped scatter-add over features (the role of the
  reference's OpenCL/CUDA ``histogram16/64/256`` kernels)
- split finding: vectorized cumulative-sum gain scan over [F, B] — replaces
  ``FeatureHistogram::FindBestThreshold``
- partition: elementwise leaf-id update, no row shuffling (the reference's
  ``DataPartition`` reorders indices; dense masks are TPU-friendlier)

Histogram subtraction trick (parent - child = sibling) is applied as in
``serial_tree_learner.cpp`` to halve histogram work.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnums=(4,))
def _build_histogram_xla(binned, grad, hess, row_mask, num_bins: int):
    gm = jnp.where(row_mask, grad, 0.0)
    hm = jnp.where(row_mask, hess, 0.0)
    cm = row_mask.astype(grad.dtype)

    def one_feature(bins_f):
        hg = jnp.zeros(num_bins, grad.dtype).at[bins_f].add(gm)
        hh = jnp.zeros(num_bins, grad.dtype).at[bins_f].add(hm)
        hc = jnp.zeros(num_bins, grad.dtype).at[bins_f].add(cm)
        return hg, hh, hc

    hg, hh, hc = jax.vmap(one_feature)(binned.T)
    return hg, hh, hc


# VMEM budget for the Pallas kernel's row panels: [8, n] i32 bins +
# [3, n] f32 values must fit comfortably (~44 bytes/row, 16 MB VMEM)
_HIST_PALLAS_MAX_ROWS = 150_000


def build_histogram(binned, grad, hess, row_mask, num_bins: int):
    """Per-feature histograms of gradient/hessian/count for masked rows.

    binned: [n, F] int32; grad/hess: [n]; row_mask: [n] bool.
    Returns (hist_g, hist_h, hist_c) each [F, B].

    On TPU this routes to the Pallas one-hot-matmul kernel
    (``ops/kernels/histogram.py``: hist[f] = vals @ onehot(bins) on the MXU
    — the role of the reference's OpenCL/CUDA ``histogram256`` kernels,
    ``gpu_tree_learner.cpp:1104``; measured 4.8x the XLA scatter-add at
    n=1e5). The XLA path serves CPU and row counts past the VMEM budget.
    """
    if (jax.default_backend() == "tpu"
            and int(binned.shape[0]) <= _HIST_PALLAS_MAX_ROWS):
        from gpboost_tpu.ops.kernels.histogram import histogram_pallas
        hg, hh, hc = histogram_pallas(binned, grad, hess, row_mask, num_bins)
        dt = grad.dtype
        return hg.astype(dt), hh.astype(dt), hc.astype(dt)
    return _build_histogram_xla(binned, grad, hess, row_mask, num_bins)


def _threshold_l1(g, l1):
    return jnp.sign(g) * jnp.maximum(jnp.abs(g) - l1, 0.0)


@jax.jit
def expand_bundle_hist(hg, hh, hc, src_col, src_bin, default_bin, fix_mask):
    """Reconstruct per-feature [F, B] histograms from EFB bundle histograms
    [G, Bh] (lossless; see ``dataset.py`` EFBInfo): gather each feature's
    non-default bins from its bundle column, then fill the default-bin slot
    with leaf_total - (non-default mass). Exact because every row lands in
    exactly one bin of every bundle column."""
    F = src_col.shape[0]
    valid = src_bin >= 0
    idx = jnp.maximum(src_bin, 0)
    rows = jnp.arange(F)

    def one(h):
        g = jnp.where(valid, h[src_col[:, None], idx], 0.0)
        tot = jnp.sum(h) / h.shape[0]
        corr = jnp.where(fix_mask, tot - jnp.sum(g, axis=1), 0.0)
        return g.at[rows, default_bin].add(corr)

    return one(hg), one(hh), one(hc)


@partial(jax.jit, static_argnames=("use_smoothing", "use_bounds"))
def find_best_split(hist_g, hist_h, hist_c, num_bins_per_feat,
                    lambda_l1, lambda_l2, min_data_in_leaf,
                    min_sum_hessian, min_gain_to_split,
                    monotone=None, penalty=None, nan_mask=None,
                    extra_bins=None, path_smooth=0.0, parent_output=0.0,
                    mono_lo=0.0, mono_hi=0.0, mono_penalty_mult=None,
                    gain_mult=None,
                    use_smoothing=False, use_bounds=False):
    """Best (feature, bin, gain) over all features.

    Vectorized over [F, B]: left stats are prefix sums over bins; split at
    bin b sends bins <= b left. Matches ``FeatureHistogram::FindBestThreshold``
    gain math: gain = S(GL,HL) + S(GR,HR) - S(G,H),
    S(G,H) = ThresholdL1(G,l1)^2 / (H + l2).

    ``nan_mask`` [F] marks features with an exclusive NA bin at index 0: for
    those, both default directions for missing values are scored (LightGBM
    ``default_left`` learning, feature_histogram.hpp FindBestThreshold's
    NA-bin two-pass). Returns (feat, bin, gain, ok, GL, HL, CL, default_left).

    Optional LightGBM extensions:
    - ``extra_bins`` [F]: extremely-randomized trees (``extra_trees``,
      config.h:368) — only the one pre-drawn random bin per feature is
      scored (USE_RAND in feature_histogram.hpp).
    - ``path_smooth`` / ``parent_output``: leaf-value smoothing along the
      path (config.h:550); outputs shrink toward the parent's with weight
      n/(n + path_smooth), and gains use the smoothed outputs
      (GetSplitGains USE_SMOOTHING).
    - ``mono_lo``/``mono_hi``: the leaf's monotone output bounds — the
      'intermediate' constraints method scores gains with clamped outputs.
    - ``mono_penalty_mult`` [F]: multiplicative gain penalty for splits on
      monotone features (ComputeMonotoneSplitGainPenalty, depth-dependent).
    """
    GL = jnp.cumsum(hist_g, axis=1)
    HL = jnp.cumsum(hist_h, axis=1)
    CL = jnp.cumsum(hist_c, axis=1)
    G = GL[:, -1:]
    H = HL[:, -1:]
    C = CL[:, -1:]

    use_out_score = use_smoothing or use_bounds

    def out_of(g, h, c):
        o = -_threshold_l1(g, lambda_l1) / (h + lambda_l2 + 1e-15)
        if use_smoothing:
            w = c / (c + path_smooth)
            o = o * w + (1.0 - w) * parent_output
        if use_bounds:
            o = jnp.clip(o, mono_lo, mono_hi)
        return o

    def score(g, h, c=None):
        if not use_out_score:
            t = _threshold_l1(g, lambda_l1)
            return t * t / (h + lambda_l2 + 1e-15)
        # GetLeafGainGivenOutput: -(2 G w + (H + l2) w^2) at the (smoothed /
        # clamped) output — reduces to the closed form when unconstrained
        o = out_of(g, h, c)
        return -(2.0 * g * o + (h + lambda_l2) * o * o)

    F, B = hist_g.shape
    bin_ids = jnp.arange(B)[None, :]

    def gain_and_valid(GLv, HLv, CLv):
        GR = G - GLv
        HR = H - HLv
        CR = C - CLv
        gain = score(GLv, HLv, CLv) + score(GR, HR, CR) - score(G, H, C)
        valid = (bin_ids < (num_bins_per_feat[:, None] - 1))
        valid &= (CLv >= min_data_in_leaf) & (CR >= min_data_in_leaf)
        valid &= (HLv >= min_sum_hessian) & (HR >= min_sum_hessian)
        if extra_bins is not None:
            valid &= bin_ids == extra_bins[:, None]
        if monotone is not None:
            # basic monotone-constraint feasibility (monotone_constraints.hpp):
            # +1 requires left_output <= right_output, -1 the reverse
            left_out = -_threshold_l1(GLv, lambda_l1) / (HLv + lambda_l2 + 1e-15)
            right_out = -_threshold_l1(GR, lambda_l1) / (HR + lambda_l2 + 1e-15)
            mono = monotone[:, None]
            valid &= jnp.where(mono > 0, left_out <= right_out, True)
            valid &= jnp.where(mono < 0, left_out >= right_out, True)
        if mono_penalty_mult is not None:
            gain = gain * mono_penalty_mult[:, None]
        if gain_mult is not None:
            # per-feature gain multipliers (feature_contri, config.h:505;
            # feature_histogram.hpp applies contri to the threshold gain)
            gain = gain * gain_mult[:, None]
        return jnp.where(valid, gain, -jnp.inf)

    gain = gain_and_valid(GL, HL, CL)  # NA bin (bin 0) on the LEFT
    if nan_mask is None:
        default_left = jnp.ones((F, B), bool)
    else:
        # second pass: NA bin on the RIGHT (subtract it from every prefix)
        nm = nan_mask[:, None]
        GL2 = GL - jnp.where(nm, hist_g[:, :1], 0.0)
        HL2 = HL - jnp.where(nm, hist_h[:, :1], 0.0)
        CL2 = CL - jnp.where(nm, hist_c[:, :1], 0.0)
        gain2 = gain_and_valid(GL2, HL2, CL2)
        gain2 = jnp.where(nm & (CL2 > 0), gain2, -jnp.inf)
        default_left = gain >= gain2
        gain = jnp.maximum(gain, gain2)
        GL = jnp.where(default_left, GL, GL2)
        HL = jnp.where(default_left, HL, HL2)
        CL = jnp.where(default_left, CL, CL2)
    if penalty is None:
        sel = gain
    else:
        # CEGB: feature-wise cost subtracted from the gain before ranking
        # (cost_effective_gradient_boosting.hpp:66-84, applied at
        # serial_tree_learner.cpp:741-745); raw gain still gates
        # min_gain_to_split, the penalized gain must additionally be > 0
        sel = gain - penalty[:, None]
    flat = jnp.argmax(sel)
    f_best = flat // B
    b_best = flat % B
    g_best = sel[f_best, b_best]
    ok = gain[f_best, b_best] > min_gain_to_split
    if penalty is not None:
        ok &= g_best > 0.0
    return (f_best.astype(jnp.int32), b_best.astype(jnp.int32), g_best, ok,
            GL[f_best, b_best], HL[f_best, b_best], CL[f_best, b_best],
            default_left[f_best, b_best])


@jax.jit
def partition_rows(binned, row_leaf, leaf_id, feature, bin_thresh,
                   left_id, right_id, miss_right=False):
    """Send rows of ``leaf_id`` with bin[:, feature] <= bin_thresh to
    ``left_id``, the rest to ``right_id``. ``miss_right`` sends the NA bin
    (bin 0 of a feature with missing values) right instead."""
    in_leaf = row_leaf == leaf_id
    b = binned[:, feature]
    go_left = (b <= bin_thresh) & ~(jnp.asarray(miss_right) & (b == 0))
    new_leaf = jnp.where(go_left, left_id, right_id)
    return jnp.where(in_leaf, new_leaf, row_leaf)


@jax.jit
def partition_rows_categorical(binned, row_leaf, leaf_id, feature,
                               cat_mask, left_id, right_id):
    """Categorical split: rows whose category bin is in ``cat_mask`` [B] go
    left."""
    in_leaf = row_leaf == leaf_id
    go_left = cat_mask[binned[:, feature]]
    new_leaf = jnp.where(go_left, left_id, right_id)
    return jnp.where(in_leaf, new_leaf, row_leaf)


def find_best_split_categorical(hist_g, hist_h, hist_c, num_bins_per_feat,
                                cat_feature_mask, lambda_l1, lambda_l2,
                                min_data_in_leaf, min_sum_hessian,
                                min_gain_to_split, max_cat_threshold,
                                penalty=None, cat_l2=0.0, cat_smooth=0.0,
                                min_data_per_group=0.0,
                                max_cat_to_onehot=0):
    """Best categorical split (``feature_histogram.hpp``
    FindBestThresholdCategoricalInner):

    - features with <= ``max_cat_to_onehot`` bins use ONE-HOT (one-vs-rest)
      splits with plain lambda_l2;
    - otherwise 'many-vs-many': categories with count >= ``cat_smooth`` are
      sorted by G / (H + cat_smooth) and BOTH prefix directions are scanned
      with l2 + cat_l2, left-set size capped at
      min(max_cat_threshold, (used_bin + 1) / 2), and split positions gated
      by the ``min_data_per_group`` group accumulation.

    Returns (feat, k_prefix, gain, ok, sort_order [F, B], GL, HL, CL) where
    the left set is the first ``k_prefix + 1`` categories of
    ``sort_order[feat]`` (the order rows already encode direction/one-hot).
    """
    F, B = hist_g.shape
    bin_ids = jnp.arange(B)[None, :]
    in_range = bin_ids < num_bins_per_feat[:, None]
    G = jnp.sum(jnp.where(in_range, hist_g, 0.0), axis=1, keepdims=True)
    H = jnp.sum(jnp.where(in_range, hist_h, 0.0), axis=1, keepdims=True)
    C = jnp.sum(jnp.where(in_range, hist_c, 0.0), axis=1, keepdims=True)

    def score(g, h, l2):
        t = _threshold_l1(g, lambda_l1)
        return t * t / (h + l2 + 1e-15)

    # ---- one-hot candidates: left = {single category} ----
    gain_oh = (score(hist_g, hist_h, lambda_l2)
               + score(G - hist_g, H - hist_h, lambda_l2)
               - score(G, H, lambda_l2))
    valid_oh = in_range & (hist_c >= min_data_in_leaf) \
        & ((C - hist_c) >= min_data_in_leaf) \
        & (hist_h >= min_sum_hessian) \
        & ((H - hist_h) >= min_sum_hessian)
    use_onehot = (num_bins_per_feat <= max_cat_to_onehot)[:, None]
    gain_oh = jnp.where(valid_oh & use_onehot, gain_oh, -jnp.inf)

    # ---- many-vs-many ----
    l2m = lambda_l2 + cat_l2
    eligible = in_range & (hist_c >= max(cat_smooth, 1.0))
    sort_key = jnp.where(eligible, hist_g / (hist_h + cat_smooth + 1e-15),
                         jnp.inf)
    order_fwd = jnp.argsort(sort_key, axis=1)
    used_bin = jnp.sum(eligible, axis=1)                      # [F]
    # reversed direction: flip the eligible prefix of the sorted order
    idx_rev = jnp.clip(used_bin[:, None] - 1 - bin_ids, 0, B - 1)
    order_rev = jnp.take_along_axis(order_fwd, idx_rev, axis=1)
    max_num_cat = jnp.minimum(max_cat_threshold, (used_bin + 1) // 2)

    def scan_dir(order):
        take = jnp.take_along_axis
        g_s = take(hist_g, order, axis=1)
        h_s = take(hist_h, order, axis=1)
        c_s = take(hist_c, order, axis=1)
        GL = jnp.cumsum(g_s, axis=1)
        HL = jnp.cumsum(h_s, axis=1)
        CL = jnp.cumsum(c_s, axis=1)
        CR = C - CL
        HR = H - HL
        base_ok = (CL >= min_data_in_leaf) & (HL >= min_sum_hessian) \
            & (CR >= min_data_in_leaf) & (HR >= min_sum_hessian) \
            & (bin_ids < jnp.minimum(max_num_cat, used_bin)[:, None])
        if min_data_per_group > 0:
            # cnt_cur_group accumulation: a position is a group boundary
            # only once >= min_data_per_group data accrued since the last
            # boundary; the right side must also keep min_data_per_group
            def step(carry, x):
                cnt_i, ok_i = x
                cur = carry + cnt_i
                boundary = ok_i & (cur >= min_data_per_group)
                return jnp.where(boundary, 0.0, cur), boundary

            _, boundary = jax.lax.scan(
                step, jnp.zeros(F, hist_c.dtype),
                (c_s.T, (base_ok & (CR >= min_data_per_group)).T))
            ok = boundary.T
        else:
            ok = base_ok
        gain = (score(GL, HL, l2m) + score(G - GL, HR, l2m)
                - score(G, H, l2m))
        return jnp.where(ok & ~use_onehot, gain, -jnp.inf), GL, HL, CL

    gain_f, GLf, HLf, CLf = scan_dir(order_fwd)
    gain_r, GLr, HLr, CLr = scan_dir(order_rev)

    # per-feature combine: one-hot as (order with winning cat first, k=0)
    oh_best_bin = jnp.argmax(gain_oh, axis=1)                 # [F]
    oh_best_gain = jnp.take_along_axis(
        gain_oh, oh_best_bin[:, None], axis=1)[:, 0]
    order_oh = jnp.argsort(
        jnp.where(bin_ids == oh_best_bin[:, None], -1, bin_ids), axis=1)
    gain_oh_mat = jnp.where(bin_ids == 0, oh_best_gain[:, None], -jnp.inf)

    cand = jnp.stack([gain_f, gain_r, gain_oh_mat])           # [3, F, B]
    cand = jnp.where(cat_feature_mask[None, :, None], cand, -jnp.inf)
    if penalty is not None:
        cand = cand - penalty[None, :, None]
    flat = jnp.argmax(cand)
    d_best = flat // (F * B)
    f_best = (flat // B) % F
    k_best = flat % B
    g_best = cand[d_best, f_best, k_best]
    raw_gain = jnp.stack([gain_f, gain_r, gain_oh_mat])[d_best, f_best,
                                                        k_best]
    ok = raw_gain > min_gain_to_split
    if penalty is not None:
        ok &= g_best > 0.0
    order = jnp.stack([order_fwd, order_rev, order_oh])[d_best]
    GL_oh = jnp.cumsum(jnp.take_along_axis(hist_g, order_oh, axis=1), axis=1)
    HL_oh = jnp.cumsum(jnp.take_along_axis(hist_h, order_oh, axis=1), axis=1)
    CL_oh = jnp.cumsum(jnp.take_along_axis(hist_c, order_oh, axis=1), axis=1)
    GLs = jnp.stack([GLf, GLr, GL_oh])
    HLs = jnp.stack([HLf, HLr, HL_oh])
    CLs = jnp.stack([CLf, CLr, CL_oh])
    return (f_best.astype(jnp.int32), k_best.astype(jnp.int32), g_best, ok,
            order, GLs[d_best, f_best, k_best], HLs[d_best, f_best, k_best],
            CLs[d_best, f_best, k_best])


@dataclass
class Tree:
    """Grown tree in flat-array form (reference ``Tree``, ``io/tree.cpp``).

    Internal nodes: split_feature/threshold(+bin); leaves: leaf_value.
    ``left/right`` of a leaf point to itself, so fixed-iteration traversal
    reaches a fixed point (jit-friendly — no data-dependent loop bounds).
    """
    split_feature: np.ndarray   # [M] int32
    threshold: np.ndarray       # [M] float64 (raw-value threshold, <= left)
    threshold_bin: np.ndarray   # [M] int32
    left: np.ndarray            # [M] int32
    right: np.ndarray           # [M] int32
    leaf_value: np.ndarray      # [M] float64 (0 for internal)
    is_leaf: np.ndarray         # [M] bool
    node_count: np.ndarray = None  # [M] float64 training cover (for SHAP)
    is_categorical: np.ndarray = None  # [M] bool categorical split marker
    cat_mask: np.ndarray = None        # [M, B] bool left-set membership
    # linear-tree leaf models (reference treelearner/linear_tree_learner.cpp):
    lin_features: np.ndarray = None    # [M, K] int32 feature ids (-1 pad)
    lin_coefs: np.ndarray = None       # [M, K] float64 coefficients
    split_gain: np.ndarray = None      # [M] float64 gain of each split
    default_left: np.ndarray = None    # [M] bool NA default direction
    num_leaves: int = 0
    max_depth_used: int = 1
    shrinkage: float = 1.0

    def internal_nodes(self) -> np.ndarray:
        """Indices of REAL internal (split) nodes. The flat arrays are
        fixed-size [2*num_leaves-1]; nodes never allocated (growth stopped
        early) have ``is_leaf=False`` but ``left`` pointing to themselves —
        ``~is_leaf`` alone would count them as feature-0 splits."""
        idx = np.arange(len(self.is_leaf))
        return np.flatnonzero(~self.is_leaf & (self.left != idx))

    def to_dict(self):
        return {
            "split_feature": self.split_feature.tolist(),
            "threshold": self.threshold.tolist(),
            "threshold_bin": self.threshold_bin.tolist(),
            "left": self.left.tolist(), "right": self.right.tolist(),
            "leaf_value": self.leaf_value.tolist(),
            "is_leaf": self.is_leaf.tolist(),
            "node_count": (None if self.node_count is None
                           else self.node_count.tolist()),
            "is_categorical": (None if self.is_categorical is None
                               else self.is_categorical.tolist()),
            "cat_mask": (None if self.cat_mask is None
                         else self.cat_mask.astype(int).tolist()),
            "lin_features": (None if self.lin_features is None
                             else self.lin_features.tolist()),
            "lin_coefs": (None if self.lin_coefs is None
                          else self.lin_coefs.tolist()),
            "split_gain": (None if self.split_gain is None
                           else self.split_gain.tolist()),
            "default_left": (None if self.default_left is None
                             else self.default_left.tolist()),
            "num_leaves": self.num_leaves,
            "max_depth_used": self.max_depth_used,
            "shrinkage": self.shrinkage,
        }

    @classmethod
    def from_dict(cls, d):
        return cls(
            split_feature=np.asarray(d["split_feature"], np.int32),
            threshold=np.asarray(d["threshold"], np.float64),
            threshold_bin=np.asarray(d["threshold_bin"], np.int32),
            left=np.asarray(d["left"], np.int32),
            right=np.asarray(d["right"], np.int32),
            leaf_value=np.asarray(d["leaf_value"], np.float64),
            is_leaf=np.asarray(d["is_leaf"], bool),
            node_count=(None if d.get("node_count") is None
                        else np.asarray(d["node_count"], np.float64)),
            is_categorical=(None if d.get("is_categorical") is None
                            else np.asarray(d["is_categorical"], bool)),
            cat_mask=(None if d.get("cat_mask") is None
                      else np.asarray(d["cat_mask"], bool)),
            lin_features=(None if d.get("lin_features") is None
                          else np.asarray(d["lin_features"], np.int32)),
            lin_coefs=(None if d.get("lin_coefs") is None
                       else np.asarray(d["lin_coefs"], np.float64)),
            split_gain=(None if d.get("split_gain") is None
                        else np.asarray(d["split_gain"], np.float64)),
            default_left=(None if d.get("default_left") is None
                          else np.asarray(d["default_left"], bool)),
            num_leaves=int(d["num_leaves"]),
            max_depth_used=int(d["max_depth_used"]),
            shrinkage=float(d.get("shrinkage", 1.0)))

    def add_shrinkage(self, rate: float):
        self.leaf_value = self.leaf_value * rate
        if self.lin_coefs is not None:
            self.lin_coefs = self.lin_coefs * rate
        self.shrinkage *= rate

    def set_leaf_values(self, values: np.ndarray):
        """Overwrite leaf outputs (GPBoost Newton leaf update path)."""
        leaf_nodes = np.flatnonzero(self.is_leaf)
        self.leaf_value[leaf_nodes] = values

    def leaf_index_order(self):
        """Node ids of leaves in creation order (= leaf numbering)."""
        return np.flatnonzero(self.is_leaf)


@dataclass
class GrowerParams:
    num_leaves: int = 31
    max_depth: int = -1
    min_data_in_leaf: int = 20
    min_sum_hessian_in_leaf: float = 1e-3
    lambda_l1: float = 0.0
    lambda_l2: float = 0.0
    min_gain_to_split: float = 0.0
    # LightGBM tail (config.h): leaf-path smoothing, extremely-randomized
    # splits, per-node feature sampling, categorical regularization,
    # monotone method/penalty
    path_smooth: float = 0.0
    extra_trees: bool = False
    feature_fraction_bynode: float = 1.0
    monotone_constraints_method: str = "basic"
    monotone_penalty: float = 0.0
    cat_l2: float = 10.0
    cat_smooth: float = 10.0
    min_data_per_group: float = 100.0
    max_cat_to_onehot: int = 4
    # cap on |leaf output| (config.h:389 max_delta_step; <= 0 = unlimited)
    max_delta_step: float = 0.0
    # per-feature split-gain multipliers (config.h:505 feature_contri)
    feature_contri: Optional[np.ndarray] = None


class CEGBState:
    """Cost-effective gradient boosting (CEGB) penalties + usage state.

    TPU redesign of ``CostEfficientGradientBoosting``
    (``treelearner/cost_effective_gradient_boosting.hpp:22-156``): the
    per-(leaf, feature) cached-SplitInfo "refund" bookkeeping is replaced by a
    dense per-feature penalty vector subtracted inside the vectorized split
    scan, with affected leaves re-scored from their cached histograms when a
    feature first enters the model. Usage state persists across trees.
    """

    def __init__(self, num_features: int, num_data: int,
                 tradeoff: float = 1.0, penalty_split: float = 0.0,
                 penalty_feature_coupled=None, penalty_feature_lazy=None):
        self.tradeoff = float(tradeoff)
        self.penalty_split = float(penalty_split)
        self.coupled = (None if penalty_feature_coupled is None
                        else np.asarray(penalty_feature_coupled, np.float64))
        self.lazy = (None if penalty_feature_lazy is None
                     else np.asarray(penalty_feature_lazy, np.float64))
        for name, arr in (("cegb_penalty_feature_coupled", self.coupled),
                          ("cegb_penalty_feature_lazy", self.lazy)):
            if arr is not None and arr.shape[0] != num_features:
                raise ValueError(
                    f"{name} should be the same size as feature number")
        self.feature_used_in_split = np.zeros(num_features, bool)
        # [n, F] marks per data point whether feature f was already acquired
        self.feature_used_in_data = (
            jnp.zeros((num_data, num_features), dtype=bool)
            if self.lazy is not None else None)

    @staticmethod
    def from_params(p: dict, num_features: int, num_data: int):
        """Build from a LightGBM-style params dict; None when disabled
        (``CostEfficientGradientBoosting::IsEnable``)."""
        tradeoff = float(p.get("cegb_tradeoff", 1.0))
        penalty_split = float(p.get("cegb_penalty_split", 0.0))
        coupled = p.get("cegb_penalty_feature_coupled", None)
        lazy = p.get("cegb_penalty_feature_lazy", None)
        if (tradeoff >= 1.0 and penalty_split <= 0.0 and coupled is None
                and lazy is None):
            return None
        return CEGBState(num_features, num_data, tradeoff, penalty_split,
                         coupled, lazy)

    def penalty_vector(self, leaf_mask,
                       num_features: int) -> jnp.ndarray:
        """tradeoff * (penalty_split*n_leaf + coupled[new features] +
        lazy per-row on-demand costs) per feature
        (cost_effective_gradient_boosting.hpp:66-84)."""
        cnt_leaf = float(jnp.sum(leaf_mask))
        pen = np.full(num_features, self.tradeoff * self.penalty_split
                      * cnt_leaf)
        if self.coupled is not None:
            pen = pen + self.tradeoff * np.where(
                self.feature_used_in_split, 0.0, self.coupled)
        pen_j = jnp.asarray(pen)
        if self.lazy is not None:
            fresh = jnp.sum(leaf_mask[:, None]
                            & ~self.feature_used_in_data, axis=0)
            pen_j = pen_j + self.tradeoff * jnp.asarray(self.lazy) * fresh
        return pen_j

    def mark_split(self, leaf_mask, feature: int) -> bool:
        """Record a chosen split; returns True if other leaves must be
        re-scored (feature newly coupled-penalized, hpp:93-109)."""
        rescore = False
        if (self.coupled is not None
                and not self.feature_used_in_split[feature]):
            rescore = True
        self.feature_used_in_split[feature] = True
        if self.lazy is not None:
            self.feature_used_in_data = self.feature_used_in_data.at[
                :, feature].set(self.feature_used_in_data[:, feature]
                                | leaf_mask)
        return rescore


def grow_tree(binned: jnp.ndarray, num_bins_per_feat: jnp.ndarray,
              grad: jnp.ndarray, hess: jnp.ndarray, max_num_bins: int,
              params: GrowerParams,
              row_mask: Optional[jnp.ndarray] = None,
              categorical_mask: Optional[np.ndarray] = None,
              max_cat_threshold: int = 32,
              monotone_constraints: Optional[np.ndarray] = None,
              forced_splits: Optional[dict] = None,
              cegb: Optional["CEGBState"] = None,
              nan_mask: Optional[np.ndarray] = None,
              voting_ctx=None, efb=None,
              interaction_constraints=None, rng=None):
    """Grow one tree leaf-wise (best-first), LightGBM-style.

    ``categorical_mask`` [F] marks categorical features: they get
    sorted-subset splits instead of threshold splits. ``nan_mask`` [F] marks
    features whose bin 0 is an exclusive NA bin (default-direction learning).
    Returns (Tree, row_leaf_node [n] int32 node-id per row).
    """
    n, F = binned.shape
    # EFB: histograms build over the bundle columns; per-feature histograms
    # are reconstructed in compute_leaf. Partitioning keeps the original bins.
    if efb is not None and voting_ctx is not None:
        efb = None      # the vote operates per original feature column
    hist_binned = efb.binned_hist if efb is not None else binned
    hist_B = efb.max_bins_hist if efb is not None else max_num_bins
    n_hist_cols = hist_binned.shape[1]
    if nan_mask is not None and not bool(np.any(nan_mask)):
        nan_mask = None
    nan_mask_j = None if nan_mask is None else jnp.asarray(nan_mask)
    has_cat = categorical_mask is not None and bool(np.any(categorical_mask))
    if has_cat:
        cat_mask_j = jnp.asarray(categorical_mask)
        num_bins_numerical = jnp.where(cat_mask_j, 0, num_bins_per_feat)
    else:
        num_bins_numerical = num_bins_per_feat
    max_nodes = 2 * params.num_leaves - 1
    feature = np.zeros(max_nodes, np.int32)
    threshold_bin = np.zeros(max_nodes, np.int32)
    is_categorical = np.zeros(max_nodes, bool)
    cat_masks = np.zeros((max_nodes, max_num_bins), bool)
    left = np.arange(max_nodes, dtype=np.int32)
    right = np.arange(max_nodes, dtype=np.int32)
    leaf_value = np.zeros(max_nodes, np.float64)
    split_gain_arr = np.zeros(max_nodes, np.float64)
    default_left_arr = np.ones(max_nodes, bool)
    is_leaf = np.zeros(max_nodes, bool)
    is_leaf[0] = True
    depth = np.zeros(max_nodes, np.int32)
    depth[0] = 1

    row_leaf = jnp.zeros(n, dtype=jnp.int32)
    if row_mask is None:
        row_mask = jnp.ones(n, dtype=bool)
    bounds = {0: (-np.inf, np.inf)}  # monotone output bounds per node
    parent_out = {0: 0.0}            # node outputs (path_smooth chain)
    path_feats = {0: frozenset()}    # features used on the path (interaction)
    if rng is None:
        rng = np.random.default_rng(0)
    nbf_np = np.asarray(num_bins_per_feat)
    if interaction_constraints:
        ic_groups = [frozenset(int(f) for f in g)
                     for g in interaction_constraints]
    else:
        ic_groups = None

    def allowed_features(used: frozenset) -> np.ndarray:
        """Features usable at a leaf under interaction constraints: the
        union of constraint groups containing every feature already used on
        the branch (serial_tree_learner.cpp GetAllowedFeatures role)."""
        allowed = np.zeros(F, bool)
        for g in ic_groups:
            if used <= g:
                for f in g:
                    if f < F:
                        allowed[f] = True
        return allowed

    l1 = params.lambda_l1
    l2 = params.lambda_l2

    mds = float(params.max_delta_step)

    def leaf_output(g_sum, h_sum, cnt=None, parent=0.0):
        raw = float(-_threshold_l1(jnp.asarray(g_sum), l1)
                    / (h_sum + l2 + 1e-15))
        if params.path_smooth > 0.0 and cnt is not None:
            w = cnt / (cnt + params.path_smooth)
            raw = raw * w + (1.0 - w) * parent
        if mds > 0.0:
            # max_delta_step (config.h:389): |output| capped; gains use the
            # capped outputs via the bounded-output score path below
            raw = min(max(raw, -mds), mds)
        return raw

    # per-leaf cached state: (hist triple, best split tuple, g_sum, h_sum, cnt)
    hist_cache: dict = {}
    best_cache: dict = {}
    stats_cache: dict = {}

    def compute_leaf(leaf_id, hist=None):
        num_bins_leaf = num_bins_numerical
        num_bins_cat = num_bins_per_feat
        # per-node feature restrictions: interaction constraints + per-node
        # feature sampling (feature_fraction_bynode, config.h:359)
        node_allowed = None
        if ic_groups is not None:
            node_allowed = allowed_features(path_feats.get(leaf_id,
                                                           frozenset()))
        if params.feature_fraction_bynode < 1.0:
            k = max(1, int(np.ceil(params.feature_fraction_bynode * F)))
            chosen = rng.choice(F, size=k, replace=False)
            samp = np.zeros(F, bool)
            samp[chosen] = True
            node_allowed = samp if node_allowed is None \
                else (node_allowed & samp)
        if node_allowed is not None:
            allowed_j = jnp.asarray(node_allowed)
            num_bins_leaf = jnp.where(allowed_j, num_bins_leaf, 0)
            num_bins_cat = jnp.where(allowed_j, num_bins_cat, 0)
        # extremely randomized trees: pre-draw ONE random candidate bin per
        # feature (USE_RAND, config.h extra_trees)
        extra_bins = None
        if params.extra_trees:
            hi = np.maximum(nbf_np - 1, 1)
            extra_bins = jnp.asarray(
                rng.integers(0, hi), jnp.int32)
        mono_kwargs = {}
        if params.feature_contri is not None:
            mono_kwargs["gain_mult"] = jnp.asarray(params.feature_contri)
        if monotone_constraints is not None:
            if params.monotone_penalty > 0.0:
                d = float(depth[leaf_id]) - 1.0  # root split depth 0
                pen = params.monotone_penalty
                if pen >= d + 1.0:
                    factor = 1e-15
                elif pen <= 1.0:
                    factor = 1.0 - pen / (2.0 ** d) + 1e-15
                else:
                    factor = 1.0 - 2.0 ** (pen - 1.0 - d) + 1e-15
                mono_kwargs["mono_penalty_mult"] = jnp.where(
                    jnp.asarray(monotone_constraints) != 0, factor, 1.0)
            if params.monotone_constraints_method != "basic":
                lo_b, hi_b = bounds.get(leaf_id, (-np.inf, np.inf))
                if np.isfinite(lo_b) or np.isfinite(hi_b):
                    mono_kwargs["mono_lo"] = lo_b
                    mono_kwargs["mono_hi"] = hi_b
                    mono_kwargs["use_bounds"] = True
        if mds > 0.0:
            # score splits with outputs clamped to +-max_delta_step
            # (feature_histogram.hpp GetSplitGains USE_MAX_OUTPUT);
            # intersects with any monotone output bounds already set
            lo_b = max(mono_kwargs.get("mono_lo", -np.inf), -mds)
            hi_b = min(mono_kwargs.get("mono_hi", np.inf), mds)
            mono_kwargs["mono_lo"] = lo_b
            mono_kwargs["mono_hi"] = hi_b
            mono_kwargs["use_bounds"] = True
        if params.path_smooth > 0.0:
            mono_kwargs["path_smooth"] = params.path_smooth
            mono_kwargs["parent_output"] = parent_out.get(leaf_id, 0.0)
            mono_kwargs["use_smoothing"] = True
        if voting_ctx is not None:
            # voting-parallel (PV-Tree): shard-local vote selects the
            # features whose histograms are globally aggregated; split
            # search is restricted to them (unselected features get 0 bins)
            mask = (row_leaf == leaf_id) & row_mask
            hist, sel_mask, (g_sum, h_sum, cnt) = voting_ctx(
                binned, grad, hess, mask)
            hist_cache[leaf_id] = hist
            num_bins_leaf = jnp.where(jnp.asarray(sel_mask),
                                      num_bins_numerical, 0)
            stats_cache[leaf_id] = (g_sum, h_sum, cnt)
            hg, hh, hc = hist
        else:
            if hist is None:
                mask = (row_leaf == leaf_id) & row_mask
                hist = build_histogram(hist_binned, grad, hess, mask, hist_B)
            hist_cache[leaf_id] = hist
            hg, hh, hc = hist
            # histograms are [cols, B]; every row lands in one bin per
            # column, so the all-column sum is cols * (per-leaf total) —
            # normalize to the true leaf totals (keeps them on the same
            # scale as per-feature GL/HL/CL)
            g_sum = float(jnp.sum(hg)) / n_hist_cols
            h_sum = float(jnp.sum(hh)) / n_hist_cols
            cnt = float(jnp.sum(hc)) / n_hist_cols
            stats_cache[leaf_id] = (g_sum, h_sum, cnt)
            if efb is not None:
                # bundle space -> exact per-feature [F, B] histograms
                hg, hh, hc = expand_bundle_hist(
                    hg, hh, hc, efb.src_col, efb.src_bin,
                    efb.default_bin, efb.fix_mask)
        mono_j = (None if monotone_constraints is None
                  else jnp.asarray(monotone_constraints, jnp.int32))
        penalty = None
        if cegb is not None:
            penalty = cegb.penalty_vector(
                (row_leaf == leaf_id) & row_mask, F)
        f_b, b_b, gain, ok, gl, hl, cl, dl = find_best_split(
            hg, hh, hc, num_bins_leaf, l1, l2,
            float(params.min_data_in_leaf), params.min_sum_hessian_in_leaf,
            params.min_gain_to_split, monotone=mono_j, penalty=penalty,
            nan_mask=nan_mask_j, extra_bins=extra_bins, **mono_kwargs)
        best = ("num", int(f_b), int(b_b), float(gain), bool(ok),
                float(gl), float(hl), float(cl), None, bool(dl))
        if has_cat:
            (fc, kc, gc, okc, order, glc, hlc, clc) = \
                find_best_split_categorical(
                    hg, hh, hc, num_bins_cat, cat_mask_j, l1, l2,
                    float(params.min_data_in_leaf),
                    params.min_sum_hessian_in_leaf,
                    params.min_gain_to_split, max_cat_threshold,
                    penalty=penalty, cat_l2=params.cat_l2,
                    cat_smooth=params.cat_smooth,
                    min_data_per_group=params.min_data_per_group,
                    max_cat_to_onehot=params.max_cat_to_onehot)
            if bool(okc) and (not best[4] or float(gc) > best[3]):
                left_cats = np.asarray(order)[int(fc), :int(kc) + 1]
                best = ("cat", int(fc), int(kc), float(gc), True,
                        float(glc), float(hlc), float(clc), left_cats, True)
        best_cache[leaf_id] = best

    compute_leaf(0)
    num_leaves = 1
    next_node = 1
    max_depth_used = 1

    def apply_numeric_split(leaf_id, f_b, b_b):
        """Split ``leaf_id`` unconditionally at (feature, bin) — the forced
        split mechanism (``forcedsplits_filename``, reference config.h:512;
        forced nodes are split root-first before best-first growth)."""
        nonlocal num_leaves, next_node, max_depth_used, row_leaf
        if cegb is not None:
            cegb.mark_split((row_leaf == leaf_id) & row_mask, f_b)
        left_id = next_node
        right_id = next_node + 1
        next_node += 2
        row_leaf = partition_rows(binned, row_leaf, leaf_id, f_b, b_b,
                                  left_id, right_id)
        is_leaf[leaf_id] = False
        feature[leaf_id] = f_b
        threshold_bin[leaf_id] = b_b
        left[leaf_id] = left_id
        right[leaf_id] = right_id
        is_leaf[left_id] = is_leaf[right_id] = True
        bounds[left_id] = bounds[right_id] = bounds.get(
            leaf_id, (-np.inf, np.inf))
        parent_out[left_id] = parent_out[right_id] = parent_out.get(
            leaf_id, 0.0)
        path_feats[left_id] = path_feats[right_id] = \
            path_feats.get(leaf_id, frozenset()) | {int(f_b)}
        depth[left_id] = depth[right_id] = depth[leaf_id] + 1
        max_depth_used = max(max_depth_used, int(depth[left_id]))
        num_leaves += 1
        hist_cache.pop(leaf_id, None)
        best_cache.pop(leaf_id, None)
        if voting_ctx is not None:
            compute_leaf(left_id)
            compute_leaf(right_id)
            return left_id, right_id
        mask = (row_leaf == left_id) & row_mask
        hist_left = build_histogram(hist_binned, grad, hess, mask, hist_B)
        mask = (row_leaf == right_id) & row_mask
        hist_right = build_histogram(hist_binned, grad, hess, mask, hist_B)
        compute_leaf(left_id, hist_left)
        compute_leaf(right_id, hist_right)
        return left_id, right_id

    def apply_forced(node_json, leaf_id):
        if num_leaves >= params.num_leaves:
            return
        f_b = int(node_json["feature"])
        b_b = int(node_json["threshold_bin"])
        lid, rid = apply_numeric_split(leaf_id, f_b, b_b)
        if isinstance(node_json.get("left"), dict):
            apply_forced(node_json["left"], lid)
        if isinstance(node_json.get("right"), dict):
            apply_forced(node_json["right"], rid)

    if forced_splits:
        apply_forced(forced_splits, 0)

    while num_leaves < params.num_leaves:
        # pick splittable leaf with max gain
        best_leaf, best = None, None
        for leaf_id, b in best_cache.items():
            if not b[4]:
                continue
            if params.max_depth > 0 and depth[leaf_id] >= params.max_depth:
                continue
            if best is None or b[3] > best[3]:
                best_leaf, best = leaf_id, b
        if best_leaf is None:
            break
        kind, f_b, b_b, gain, _, gl, hl, cl, left_cats, dflt_left = best
        g_sum, h_sum, cnt = stats_cache[best_leaf]
        if cegb is not None:
            # mark usage on ALL parent rows (UpdateLeafBestSplits runs before
            # the partition, serial_tree_learner.cpp:571-575)
            rescore = cegb.mark_split((row_leaf == best_leaf) & row_mask, f_b)
            if rescore:
                # the coupled penalty for f_b vanished: re-rank every other
                # leaf's best split from its cached histogram (replaces the
                # reference's per-(leaf,feature) SplitInfo refund, hpp:93-109)
                for other in [k for k in list(best_cache)
                              if k != best_leaf and k in hist_cache]:
                    compute_leaf(other, hist_cache[other])
        left_id = next_node
        right_id = next_node + 1
        next_node += 2
        if kind == "cat":
            mask_b = np.zeros(max_num_bins, bool)
            mask_b[left_cats] = True
            row_leaf = partition_rows_categorical(
                binned, row_leaf, best_leaf, f_b, jnp.asarray(mask_b),
                left_id, right_id)
            is_categorical[best_leaf] = True
            cat_masks[best_leaf] = mask_b
        else:
            miss_right = bool(nan_mask is not None and nan_mask[f_b]
                              and not dflt_left)
            row_leaf = partition_rows(binned, row_leaf, best_leaf, f_b, b_b,
                                      left_id, right_id,
                                      miss_right=miss_right)
        # bookkeeping
        is_leaf[best_leaf] = False
        feature[best_leaf] = f_b
        threshold_bin[best_leaf] = b_b
        split_gain_arr[best_leaf] = gain
        default_left_arr[best_leaf] = bool(dflt_left)
        left[best_leaf] = left_id
        right[best_leaf] = right_id
        is_leaf[left_id] = is_leaf[right_id] = True
        lo, hi = bounds.get(best_leaf, (-np.inf, np.inf))
        bounds[left_id] = (lo, hi)
        bounds[right_id] = (lo, hi)
        g_sum_p, h_sum_p, cnt_p = stats_cache[best_leaf]
        l_out = leaf_output(gl, hl, cl, parent_out.get(best_leaf, 0.0))
        r_out = leaf_output(g_sum_p - gl, h_sum_p - hl, cnt_p - cl,
                            parent_out.get(best_leaf, 0.0))
        parent_out[left_id] = min(max(l_out, lo), hi)
        parent_out[right_id] = min(max(r_out, lo), hi)
        pf = path_feats.get(best_leaf, frozenset())
        path_feats[left_id] = path_feats[right_id] = pf | {int(f_b)}
        if (monotone_constraints is not None and kind == "num"
                and monotone_constraints[f_b] != 0):
            lo_, hi_ = lo, hi
            l_c = min(max(l_out, lo_), hi_)
            r_c = min(max(r_out, lo_), hi_)
            if params.monotone_constraints_method in ("intermediate",
                                                      "advanced"):
                # IntermediateLeafConstraints::UpdateConstraintsWithOutputs:
                # children bounded by the ACTUAL sibling outputs (tighter
                # than the midpoint; 'advanced' additionally re-tightens
                # non-sibling leaves — approximated by the same bounds here)
                if monotone_constraints[f_b] > 0:
                    bounds[left_id] = (lo, min(hi, r_c))
                    bounds[right_id] = (max(lo, l_c), hi)
                else:
                    bounds[left_id] = (max(lo, r_c), hi)
                    bounds[right_id] = (lo, min(hi, l_c))
            else:
                mid = 0.5 * (l_c + r_c)
                if monotone_constraints[f_b] > 0:
                    bounds[left_id] = (lo, min(hi, mid))
                    bounds[right_id] = (max(lo, mid), hi)
                else:
                    bounds[left_id] = (max(lo, mid), hi)
                    bounds[right_id] = (lo, min(hi, mid))
        depth[left_id] = depth[right_id] = depth[best_leaf] + 1
        max_depth_used = max(max_depth_used, int(depth[left_id]))
        num_leaves += 1
        # child histograms: smaller side direct, sibling by subtraction
        parent_hist = hist_cache.pop(best_leaf)
        best_cache.pop(best_leaf)
        if voting_ctx is not None:
            # voting mode: parent/child feature selections differ, so the
            # subtraction trick is undefined — vote + aggregate each child
            compute_leaf(left_id)
            compute_leaf(right_id)
            continue
        left_cnt = cl
        if left_cnt <= cnt / 2:
            mask = (row_leaf == left_id) & row_mask
            hist_left = build_histogram(hist_binned, grad, hess, mask, hist_B)
            hist_right = tuple(p - c for p, c in zip(parent_hist, hist_left))
        else:
            mask = (row_leaf == right_id) & row_mask
            hist_right = build_histogram(hist_binned, grad, hess, mask, hist_B)
            hist_left = tuple(p - c for p, c in zip(parent_hist, hist_right))
        compute_leaf(left_id, hist_left)
        compute_leaf(right_id, hist_right)

    # leaf values (path-smoothed and clipped to monotone bounds)
    for leaf_id, (g_sum, h_sum, cnt) in stats_cache.items():
        if is_leaf[leaf_id]:
            if params.path_smooth > 0.0 and leaf_id != 0:
                v = parent_out.get(leaf_id, leaf_output(g_sum, h_sum))
            else:
                v = leaf_output(g_sum, h_sum,
                                cnt if params.path_smooth > 0.0 else None,
                                0.0)
            if monotone_constraints is not None:
                lo, hi = bounds.get(leaf_id, (-np.inf, np.inf))
                v = min(max(v, lo), hi)
            leaf_value[leaf_id] = v

    node_count = np.zeros(max_nodes, np.float64)
    for node_id, (_, _, cnt) in stats_cache.items():
        node_count[node_id] = cnt
    tree = Tree(split_feature=feature, threshold=np.zeros(max_nodes),
                threshold_bin=threshold_bin, left=left, right=right,
                leaf_value=leaf_value, is_leaf=is_leaf, node_count=node_count,
                is_categorical=is_categorical, cat_mask=cat_masks,
                split_gain=split_gain_arr, default_left=default_left_arr,
                num_leaves=num_leaves, max_depth_used=max_depth_used)
    return tree, row_leaf


@partial(jax.jit, static_argnums=(4, 5, 6, 15),
         static_argnames=("use_smoothing", "use_bounds", "use_extra",
                          "ffb_k", "max_cat_threshold", "cat_l2",
                          "cat_smooth", "min_data_per_group",
                          "max_cat_to_onehot", "mono_intermediate",
                          "mono_penalty", "forced_ops", "cegb_tradeoff",
                          "cegb_split_pen"))
def _grow_tree_jit(binned, num_bins_per_feat, grad, hess,
                   max_num_bins: int, num_leaves: int, max_depth: int,
                   row_mask, l1, l2, min_data, min_hess, min_gain,
                   nan_mask=None, efb_maps=None, hist_B: int = 0,
                   hist_binned=None, gain_mult=None,
                   path_smooth=0.0, use_smoothing: bool = False,
                   mds=0.0, use_bounds: bool = False,
                   rng_key=None, use_extra: bool = False, ffb_k: int = 0,
                   ic_groups=None, cat_feature_mask=None,
                   max_cat_threshold: int = 32, cat_l2: float = 10.0,
                   cat_smooth: float = 10.0,
                   min_data_per_group: float = 100.0,
                   max_cat_to_onehot: int = 4,
                   mono_vec=None, mono_intermediate: bool = False,
                   mono_penalty: float = 0.0,
                   forced_ops: tuple = (),
                   cegb_coupled=None, cegb_lazy=None,
                   cegb_used0=None, cegb_data0=None,
                   cegb_tradeoff: float = 1.0,
                   cegb_split_pen: float = 0.0):
    """Whole-tree leaf-wise growth in ONE jitted program.

    The host-driven grower above dispatches ~15 device calls (with blocking
    host syncs) per split — fine on CPU, but each round trip costs tens of
    milliseconds over the TPU tunnel, making boosting dispatch-bound. This
    fast path runs the full best-first loop as a lax.while_loop: histogram,
    subtraction trick, split scoring, and partition all stay on device; one
    dispatch + one fetch per TREE. Same split math as
    :func:`find_best_split` / :func:`find_best_split_categorical`.

    Beyond the numeric core it covers, all inside the while_loop (gated by
    STATIC flags so the common case compiles the same program as before):

    - categorical sorted-subset splits (``cat_feature_mask`` [F]): the
      per-leaf candidate keeps a [B] left-set mask, partition routes rows
      through it (feature_histogram.hpp FindBestThresholdCategoricalInner);
    - ``path_smooth``/``use_smoothing``: per-node outputs tracked in
      ``pout`` so children smooth toward their parent (config.h:550);
    - ``mds``/``use_bounds``: ±max_delta_step output clamps in gains and
      leaf values (config.h:389);
    - ``use_extra`` (extra_trees) and ``ffb_k`` (feature_fraction_bynode):
      per-leaf-evaluation draws from ``rng_key`` folded with an evaluation
      counter — replaces the host grower's numpy RNG calls;
    - ``ic_groups`` [G, F]: interaction constraints as per-node used-feature
      masks (serial_tree_learner.cpp GetAllowedFeatures role) — masking,
      not host dicts;
    - ``mono_vec`` [F] (+ ``mono_intermediate``/``mono_penalty`` statics):
      monotone constraints as per-node (lo, hi) bound ARRAYS in the carry —
      basic midpoint bounds or intermediate actual-output bounds, with the
      depth-dependent gain penalty (monotone_constraints.hpp:355);
    - ``forced_ops``: static (leaf_id, feature, bin) prefix applied
      root-first before best-first growth (forcedsplits_filename,
      config.h:512) — unrolled, no dynamic control flow;
    - ``cegb_*``: cost-effective gradient boosting — usage state
      (``cegb_used0`` [F], ``cegb_data0`` [n, F] for lazy penalties)
      carried through the loop and RETURNED (appended to the output tuple)
      so it persists across trees; a freshly coupled-penalized feature
      re-scores every other live leaf inside the loop, replicating the host
      grower's rescore (cost_effective_gradient_boosting.hpp:93-109).

    Only the voting-parallel learner stays on the host grower.
    """
    n, F = binned.shape
    M = 2 * num_leaves - 1
    dtype = grad.dtype
    has_cat = cat_feature_mask is not None
    need_rng = use_extra or ffb_k > 0
    use_mono = mono_vec is not None
    use_cegb = cegb_used0 is not None
    cegb_has_lazy = cegb_data0 is not None
    NEG_INF = jnp.asarray(-jnp.inf, dtype)
    POS_INF = jnp.asarray(jnp.inf, dtype)
    # EFB (see dataset.py EFBInfo): histograms build over bundle columns,
    # expanded to per-feature [F, B] only inside eval_leaf
    if hist_binned is None:
        hist_binned = binned
        hist_B = max_num_bins
    HC = hist_binned.shape[1]
    if has_cat:
        num_bins_numeric = jnp.where(cat_feature_mask, 0, num_bins_per_feat)
    else:
        num_bins_numeric = num_bins_per_feat

    def allowed_mask(used_vec, ctr):
        """Per-leaf-evaluation feature restrictions (None = all allowed)."""
        allowed = None
        if ic_groups is not None:
            # usable groups: those containing every feature already used on
            # the branch; allowed = union of usable groups
            sub = jnp.all(ic_groups | ~used_vec[None, :], axis=1)
            allowed = jnp.any(ic_groups & sub[:, None], axis=0)
        if ffb_k > 0:
            kf = jax.random.fold_in(rng_key, 2 * ctr + 1)
            u = jax.random.uniform(kf, (F,))
            samp = u <= jnp.sort(u)[ffb_k - 1]
            allowed = samp if allowed is None else allowed & samp
        return allowed

    def eval_leaf(hist, pout_leaf, used_vec, ctr, lo=None, hi=None,
                  depth_leaf=None, leaf_mask=None, cegb_used=None,
                  cegb_data=None):
        """Best candidate split for one leaf: (f, bin/k, gain, ok,
        default_left, is_cat, cat_left_mask[B])."""
        hg, hh, hc = hist
        if efb_maps is not None:
            hg, hh, hc = expand_bundle_hist(hg, hh, hc, *efb_maps)
        allowed = allowed_mask(used_vec, ctr)
        nb_num = num_bins_numeric
        if allowed is not None:
            nb_num = jnp.where(allowed, nb_num, 0)
        extra_bins = None
        if use_extra:
            ke = jax.random.fold_in(rng_key, 2 * ctr)
            extra_bins = jax.random.randint(
                ke, (F,), 0,
                jnp.maximum(num_bins_per_feat - 1, 1)).astype(jnp.int32)
        kwargs = {}
        if use_smoothing:
            kwargs.update(path_smooth=path_smooth,
                          parent_output=pout_leaf, use_smoothing=True)
        # output bounds: max_delta_step intersected with the leaf's monotone
        # bounds (host grower's mono_kwargs assembly)
        if use_bounds or (use_mono and mono_intermediate):
            lo_e = lo if (use_mono and mono_intermediate) else NEG_INF
            hi_e = hi if (use_mono and mono_intermediate) else POS_INF
            if use_bounds:
                lo_e = jnp.maximum(lo_e, -mds)
                hi_e = jnp.minimum(hi_e, mds)
            kwargs.update(mono_lo=lo_e, mono_hi=hi_e, use_bounds=True)
        if use_mono:
            kwargs["monotone"] = mono_vec
            if mono_penalty > 0.0:
                # ComputeMonotoneSplitGainPenalty (root split depth 0)
                d = (depth_leaf - 1).astype(dtype)
                factor = jnp.where(
                    mono_penalty >= d + 1.0, 1e-15,
                    jnp.where(mono_penalty <= 1.0,
                              1.0 - mono_penalty / jnp.exp2(d) + 1e-15,
                              1.0 - jnp.exp2(mono_penalty - 1.0 - d)
                              + 1e-15))
                kwargs["mono_penalty_mult"] = jnp.where(
                    mono_vec != 0, factor, 1.0)
        penalty = None
        if use_cegb:
            cnt_leaf = jnp.sum(leaf_mask.astype(dtype))
            penalty = jnp.full((F,), cegb_tradeoff * cegb_split_pen
                               * 0.0, dtype) + (cegb_tradeoff
                                                * cegb_split_pen * cnt_leaf)
            if cegb_coupled is not None:
                penalty = penalty + cegb_tradeoff * jnp.where(
                    cegb_used, 0.0, cegb_coupled.astype(dtype))
            if cegb_has_lazy:
                fresh = jnp.sum(
                    (leaf_mask[:, None] & ~cegb_data).astype(dtype), axis=0)
                penalty = penalty + (cegb_tradeoff
                                     * cegb_lazy.astype(dtype) * fresh)
            kwargs["penalty"] = penalty
        f, b, gain, ok, _, _, _, dl = find_best_split(
            hg, hh, hc, nb_num, l1, l2, min_data, min_hess, min_gain,
            nan_mask=nan_mask, extra_bins=extra_bins, gain_mult=gain_mult,
            **kwargs)
        if not has_cat:
            return f, b, gain, ok, dl, jnp.zeros((), bool), None
        nb_cat = num_bins_per_feat
        if allowed is not None:
            nb_cat = jnp.where(allowed, nb_cat, 0)
        fc, kc, gc, okc, order, _, _, _ = find_best_split_categorical(
            hg, hh, hc, nb_cat, cat_feature_mask, l1, l2, min_data,
            min_hess, min_gain, max_cat_threshold, penalty=penalty,
            cat_l2=cat_l2,
            cat_smooth=cat_smooth, min_data_per_group=min_data_per_group,
            max_cat_to_onehot=max_cat_to_onehot)
        cat_sel = okc & (~ok | (gc > gain))
        B = order.shape[1]
        catm = jnp.zeros(max_num_bins, bool).at[order[fc]].set(
            jnp.arange(B) <= kc)
        catm &= cat_sel
        return (jnp.where(cat_sel, fc, f), jnp.where(cat_sel, kc, b),
                jnp.where(cat_sel, gc, gain), jnp.where(cat_sel, okc, ok),
                cat_sel | dl, cat_sel, catm)

    used0 = jnp.zeros(F, bool) if ic_groups is not None else None
    hist0 = build_histogram(hist_binned, grad, hess, row_mask, hist_B)
    f0, b0, gain0, ok0, dl0, ic0, catm0 = eval_leaf(
        hist0, jnp.zeros((), dtype), used0, 0,
        lo=NEG_INF, hi=POS_INF, depth_leaf=jnp.asarray(1, jnp.int32),
        leaf_mask=row_mask, cegb_used=cegb_used0, cegb_data=cegb_data0)

    z_f = jnp.zeros(M, dtype)
    z_i = jnp.zeros(M, jnp.int32)
    state = dict(
        row_leaf=jnp.zeros(n, jnp.int32),
        feature=z_i, thresh=z_i,
        left=jnp.arange(M, dtype=jnp.int32),
        right=jnp.arange(M, dtype=jnp.int32),
        is_leaf=jnp.zeros(M, bool).at[0].set(True),
        depth=z_i.at[0].set(1),
        hist=jnp.zeros((M, 3, HC, hist_B), dtype)
        .at[0].set(jnp.stack(hist0)),
        dleft=jnp.ones(M, bool), sgain=z_f,
        bf=z_i.at[0].set(f0), bb=z_i.at[0].set(b0),
        bdl=jnp.ones(M, bool).at[0].set(dl0),
        bgain=z_f.at[0].set(gain0), bok=jnp.zeros(M, bool).at[0].set(ok0),
        gsum=z_f.at[0].set(jnp.sum(hist0[0]) / HC),
        hsum=z_f.at[0].set(jnp.sum(hist0[1]) / HC),
        cnt=z_f.at[0].set(jnp.sum(hist0[2]) / HC),
        num_leaves=jnp.asarray(1, jnp.int32),
        next_node=jnp.asarray(1, jnp.int32),
        go=jnp.asarray(True))
    if use_smoothing:
        state["pout"] = z_f            # node outputs (path_smooth chain);
        # root candidates smooth toward 0.0, like the host grower
    if ic_groups is not None:
        state["used"] = jnp.zeros((M, F), bool)
    if need_rng:
        state["ectr"] = jnp.asarray(1, jnp.int32)   # root used ctr 0
    if has_cat:
        state["biscat"] = jnp.zeros(M, bool).at[0].set(ic0)
        state["bcat"] = jnp.zeros((M, max_num_bins), bool).at[0].set(catm0)
        state["iscat"] = jnp.zeros(M, bool)
        state["catmask"] = jnp.zeros((M, max_num_bins), bool)
    if use_mono:
        state["mlo"] = jnp.full(M, NEG_INF, dtype)
        state["mhi"] = jnp.full(M, POS_INF, dtype)
    if use_cegb:
        state["cegb_used"] = cegb_used0
        if cegb_has_lazy:
            state["cegb_data"] = cegb_data0

    def cand_gains(s):
        ok = s["is_leaf"] & s["bok"]
        if max_depth > 0:
            ok &= s["depth"] < max_depth
        return jnp.where(ok, s["bgain"], -jnp.inf)

    def cond(s):
        return s["go"] & (s["num_leaves"] < num_leaves)

    def do_split(s, leaf, f_b, b_b, dl_b, cat_flag, catm_leaf, gain_rec,
                 proceed):
        """Apply one split to the carry: partition, child histograms +
        candidate evals, monotone-bound / smoothing / cegb bookkeeping.
        Shared by the best-first body and the unrolled forced prefix."""
        lid = s["next_node"]
        rid = lid + 1
        sel = (s["row_leaf"] == leaf) & row_mask
        bvals = jnp.take(binned, f_b, axis=1)
        go_left = bvals <= b_b
        if nan_mask is not None:
            miss_right = nan_mask[f_b] & ~dl_b
            go_left &= ~(miss_right & (bvals == 0))
        if has_cat:
            go_left = jnp.where(cat_flag, catm_leaf[bvals], go_left)
        new_row_leaf = jnp.where(
            sel, jnp.where(go_left, lid, rid), s["row_leaf"])
        # cegb usage marks happen on the PARENT rows before the children
        # are scored (serial_tree_learner.cpp:571-575 order)
        cegb_used_new = cegb_data_new = None
        if use_cegb:
            cegb_used_new = s["cegb_used"].at[f_b].set(True)
            if cegb_has_lazy:
                cegb_data_new = s["cegb_data"].at[:, f_b].set(
                    s["cegb_data"][:, f_b] | sel)
        hist_l = jnp.stack(build_histogram(
            hist_binned, grad, hess, (new_row_leaf == lid) & row_mask,
            hist_B))
        hist_r = s["hist"][leaf] - hist_l
        gs_l = jnp.sum(hist_l[0]) / HC
        hs_l = jnp.sum(hist_l[1]) / HC
        c_l = jnp.sum(hist_l[2]) / HC
        gs_r = jnp.sum(hist_r[0]) / HC
        hs_r = jnp.sum(hist_r[1]) / HC
        c_r = jnp.sum(hist_r[2]) / HC
        if use_smoothing or use_mono:
            def node_out(g, h, c):
                o = -_threshold_l1(g, l1) / (h + l2 + 1e-15)
                if use_smoothing:
                    w = c / (c + path_smooth)
                    o = o * w + (1.0 - w) * s["pout"][leaf]
                if use_bounds:
                    o = jnp.clip(o, -mds, mds)
                return o

            po_l = node_out(gs_l, hs_l, c_l)
            po_r = node_out(gs_r, hs_r, c_r)
        else:
            po_l = po_r = jnp.zeros((), dtype)
        # monotone bounds: clip the child outputs to the parent's bounds,
        # then tighten the children on a monotone numeric split (basic =
        # midpoint, intermediate/advanced = actual sibling outputs)
        if use_mono:
            lo = s["mlo"][leaf]
            hi = s["mhi"][leaf]
            l_c = jnp.clip(po_l, lo, hi)
            r_c = jnp.clip(po_r, lo, hi)
            dirn = mono_vec[f_b]
            is_m = dirn != 0
            if has_cat:
                is_m &= ~cat_flag
            if mono_intermediate:
                bl_ref, br_ref = r_c, l_c
            else:
                bl_ref = br_ref = 0.5 * (l_c + r_c)
            lo_l = jnp.where(dirn > 0, lo, jnp.maximum(lo, bl_ref))
            hi_l = jnp.where(dirn > 0, jnp.minimum(hi, bl_ref), hi)
            lo_r = jnp.where(dirn > 0, jnp.maximum(lo, br_ref), lo)
            hi_r = jnp.where(dirn > 0, hi, jnp.minimum(hi, br_ref))
            lo_l = jnp.where(is_m, lo_l, lo)
            hi_l = jnp.where(is_m, hi_l, hi)
            lo_r = jnp.where(is_m, lo_r, lo)
            hi_r = jnp.where(is_m, hi_r, hi)
            po_l, po_r = l_c, r_c   # smoothing chain stores parent-clipped
        else:
            lo_l = lo_r = NEG_INF
            hi_l = hi_r = POS_INF
        if ic_groups is not None:
            uc = s["used"][leaf].at[f_b].set(True)
        else:
            uc = None
        ctr = s["ectr"] if need_rng else 0
        eval_extra = dict(
            cegb_used=cegb_used_new if use_cegb else None,
            cegb_data=cegb_data_new if cegb_has_lazy else None)
        fl, bl, gl_, okl, dll, icl, cml = eval_leaf(
            (hist_l[0], hist_l[1], hist_l[2]), po_l, uc, ctr,
            lo=lo_l, hi=hi_l, depth_leaf=s["depth"][leaf] + 1,
            leaf_mask=(new_row_leaf == lid) & row_mask, **eval_extra)
        fr, br, gr_, okr, dlr, icr, cmr = eval_leaf(
            (hist_r[0], hist_r[1], hist_r[2]), po_r, uc, ctr + 1,
            lo=lo_r, hi=hi_r, depth_leaf=s["depth"][leaf] + 1,
            leaf_mask=(new_row_leaf == rid) & row_mask, **eval_extra)

        def upd(arr, vals):
            return arr.at[jnp.stack([lid, rid])].set(jnp.stack(vals))

        new = dict(
            row_leaf=new_row_leaf,
            feature=s["feature"].at[leaf].set(f_b),
            thresh=s["thresh"].at[leaf].set(b_b),
            left=s["left"].at[leaf].set(lid),
            right=s["right"].at[leaf].set(rid),
            is_leaf=s["is_leaf"].at[leaf].set(False)
            .at[jnp.stack([lid, rid])].set(True),
            depth=upd(s["depth"], [s["depth"][leaf] + 1] * 2),
            hist=s["hist"].at[lid].set(hist_l).at[rid].set(hist_r)
            .at[leaf].set(0.0),
            dleft=s["dleft"].at[leaf].set(dl_b),
            sgain=s["sgain"].at[leaf].set(gain_rec),
            bf=upd(s["bf"], [fl, fr]), bb=upd(s["bb"], [bl, br]),
            bdl=upd(s["bdl"], [dll, dlr]),
            bgain=upd(s["bgain"], [gl_, gr_]),
            bok=upd(s["bok"], [okl, okr]),
            gsum=upd(s["gsum"], [gs_l, gs_r]),
            hsum=upd(s["hsum"], [hs_l, hs_r]),
            cnt=upd(s["cnt"], [c_l, c_r]),
            num_leaves=s["num_leaves"] + 1,
            next_node=s["next_node"] + 2,
            go=proceed)
        if use_smoothing:
            new["pout"] = upd(s["pout"], [po_l, po_r])
        if ic_groups is not None:
            new["used"] = s["used"].at[jnp.stack([lid, rid])].set(
                jnp.stack([uc, uc]))
        if need_rng:
            new["ectr"] = s["ectr"] + 2
        if has_cat:
            new["biscat"] = upd(s["biscat"], [icl, icr])
            new["bcat"] = upd(s["bcat"], [cml, cmr])
            new["iscat"] = s["iscat"].at[leaf].set(cat_flag)
            new["catmask"] = s["catmask"].at[leaf].set(
                catm_leaf if catm_leaf is not None
                else jnp.zeros(max_num_bins, bool))
        if use_mono:
            new["mlo"] = upd(s["mlo"], [lo_l, lo_r])
            new["mhi"] = upd(s["mhi"], [hi_l, hi_r])
        if use_cegb:
            new["cegb_used"] = cegb_used_new
            if cegb_has_lazy:
                new["cegb_data"] = cegb_data_new
        # no split left: keep the old state, stop (go must ALWAYS take the
        # new value or the loop would never terminate)
        merged = jax.tree_util.tree_map(
            lambda a, b: jnp.where(proceed, b, a), s, new)
        merged["go"] = proceed
        return merged

    def rescore_all(s):
        """Re-score every live leaf's cached candidate from its histogram
        with the CURRENT cegb state — the host grower's rescore when a
        coupled-penalized feature first enters the model."""
        def body_i(i, t):
            hist_i = (t["hist"][i, 0], t["hist"][i, 1], t["hist"][i, 2])
            pout_i = (t["pout"][i] if use_smoothing
                      else jnp.zeros((), dtype))
            used_i = t["used"][i] if ic_groups is not None else None
            lo_i = t["mlo"][i] if use_mono else NEG_INF
            hi_i = t["mhi"][i] if use_mono else POS_INF
            mask_i = (t["row_leaf"] == i) & row_mask
            f, b, g, ok, dl, ic_, cm = eval_leaf(
                hist_i, pout_i, used_i, 0, lo=lo_i, hi=hi_i,
                depth_leaf=t["depth"][i], leaf_mask=mask_i,
                cegb_used=t["cegb_used"],
                cegb_data=t.get("cegb_data"))
            live = t["is_leaf"][i]

            def u(a, v):
                return a.at[i].set(jnp.where(live, v, a[i]))

            t = dict(t)
            t["bf"] = u(t["bf"], f)
            t["bb"] = u(t["bb"], b)
            t["bgain"] = u(t["bgain"], g)
            t["bok"] = u(t["bok"], ok)
            t["bdl"] = u(t["bdl"], dl)
            if has_cat:
                t["biscat"] = u(t["biscat"], ic_)
                t["bcat"] = u(t["bcat"], cm)
            return t

        return jax.lax.fori_loop(0, M, body_i, s)

    def body(s):
        cg = cand_gains(s)
        leaf = jnp.argmax(cg).astype(jnp.int32)
        proceed = cg[leaf] > -jnp.inf
        f_b = s["bf"][leaf]
        b_b = s["bb"][leaf]
        dl_b = s["bdl"][leaf]
        cat_flag = (s["biscat"][leaf] if has_cat
                    else jnp.zeros((), bool))
        catm_leaf = s["bcat"][leaf] if has_cat else None
        fresh = (use_cegb and cegb_coupled is not None
                 and ~s["cegb_used"][f_b])
        s2 = do_split(s, leaf, f_b, b_b, dl_b, cat_flag, catm_leaf,
                      s["bgain"][leaf], proceed)
        if use_cegb and cegb_coupled is not None:
            s2 = jax.lax.cond(fresh & proceed, rescore_all,
                              lambda t: t, s2)
        return s2

    # forced-splits prefix: a STATIC list of (leaf_id, feature, bin) applied
    # unconditionally root-first (host grower apply_forced), unrolled —
    # leaf ids are deterministic under the same next_node counter
    s_run = state
    for (leaf_py, f_py, b_py) in forced_ops:
        s_run = do_split(
            s_run, jnp.asarray(leaf_py, jnp.int32),
            jnp.asarray(f_py, jnp.int32), jnp.asarray(b_py, jnp.int32),
            jnp.asarray(True), jnp.zeros((), bool),
            (jnp.zeros(max_num_bins, bool) if has_cat else None),
            jnp.zeros((), dtype), jnp.asarray(True))

    s = jax.lax.while_loop(cond, body, s_run)
    raw = -_threshold_l1(s["gsum"], l1) / (s["hsum"] + l2 + 1e-15)
    if use_smoothing:
        # non-root leaves take the output computed at creation (the host
        # grower's parent_out[leaf]); an unsplit root smooths toward 0
        leaf_value = jnp.where(s["is_leaf"], s["pout"], 0.0)
        w0 = s["cnt"][0] / (s["cnt"][0] + path_smooth)
        r0 = raw[0] * w0
        if use_bounds:
            r0 = jnp.clip(r0, -mds, mds)
        leaf_value = leaf_value.at[0].set(
            jnp.where(s["is_leaf"][0], r0, 0.0))
    elif use_bounds:
        leaf_value = jnp.where(s["is_leaf"], jnp.clip(raw, -mds, mds), 0.0)
    else:
        leaf_value = jnp.where(s["is_leaf"], raw, 0.0)
    if use_mono:
        # host grower: leaf values clipped to the node's monotone bounds
        leaf_value = jnp.where(
            s["is_leaf"], jnp.clip(leaf_value, s["mlo"], s["mhi"]), 0.0)
    iscat = s["iscat"] if has_cat else jnp.zeros(M, bool)
    catmask = (s["catmask"] if has_cat
               else jnp.zeros((M, max_num_bins), bool))
    out = (s["feature"], s["thresh"], s["left"], s["right"], leaf_value,
           s["is_leaf"], s["cnt"], s["depth"], s["num_leaves"],
           s["dleft"], s["sgain"], iscat, catmask, s["row_leaf"])
    if use_cegb:
        return out + (s["cegb_used"],
                      s["cegb_data"] if cegb_has_lazy
                      else jnp.zeros((0, 0), bool))
    return out


def flatten_forced_splits(forced: Optional[dict],
                          num_leaves: int) -> tuple:
    """Resolve a forced-splits JSON tree (already bin-resolved, see
    ``Booster._resolve_forced``) into the static (leaf_id, feature, bin)
    prefix the jitted grower unrolls. Leaf ids follow the same next_node
    counter as the growth loop (root-first order)."""
    if not forced:
        return ()
    ops = []
    counter = [1]

    def walk(node, leaf_id):
        if len(ops) + 1 >= num_leaves:
            return
        lid, rid = counter[0], counter[0] + 1
        counter[0] += 2
        ops.append((int(leaf_id), int(node["feature"]),
                    int(node["threshold_bin"])))
        if isinstance(node.get("left"), dict):
            walk(node["left"], lid)
        if isinstance(node.get("right"), dict):
            walk(node["right"], rid)

    walk(forced, 0)
    return tuple(ops)


def grow_tree_fast(binned, num_bins_per_feat, grad, hess, max_num_bins,
                   params: GrowerParams, row_mask=None, nan_mask=None,
                   efb=None, categorical_mask=None, max_cat_threshold=32,
                   interaction_constraints=None, rng=None,
                   monotone_constraints=None, forced_splits=None,
                   cegb: Optional["CEGBState"] = None):
    """Host wrapper for the jitted grower: returns (Tree, row_leaf) like
    :func:`grow_tree`. Covers numeric + categorical splits, path_smooth,
    max_delta_step, extra_trees, feature_fraction_bynode, interaction
    constraints, monotone constraints (basic/intermediate/advanced +
    penalty), forced splits, and CEGB; only voting stays on the host
    grower. A given ``CEGBState`` is updated in place after the call (usage
    state persists across trees, exactly like the host grower)."""
    n, F = binned.shape
    if row_mask is None:
        row_mask = jnp.ones(n, dtype=bool)
    if nan_mask is not None and not bool(np.any(nan_mask)):
        nan_mask = None
    efb_maps = (None if efb is None else
                (efb.src_col, efb.src_bin, efb.default_bin, efb.fix_mask))
    use_smoothing = params.path_smooth > 0.0
    mds = float(params.max_delta_step)
    use_bounds = mds > 0.0
    use_extra = bool(params.extra_trees)
    ffb_k = 0
    if params.feature_fraction_bynode < 1.0:
        k = max(1, int(np.ceil(params.feature_fraction_bynode * F)))
        ffb_k = k if k < F else 0
    rng_key = None
    if use_extra or ffb_k > 0:
        if rng is None:
            rng = np.random.default_rng(0)
        rng_key = jax.random.PRNGKey(int(rng.integers(2 ** 31 - 1)))
    ic_groups = None
    if interaction_constraints:
        g_np = np.zeros((len(interaction_constraints), F), bool)
        for i, g in enumerate(interaction_constraints):
            for f in g:
                if int(f) < F:
                    g_np[i, int(f)] = True
        ic_groups = jnp.asarray(g_np)
    has_cat = (categorical_mask is not None
               and bool(np.any(categorical_mask)))
    mono_kw = {}
    if monotone_constraints is not None and bool(
            np.any(np.asarray(monotone_constraints) != 0)):
        mono_kw = dict(
            mono_vec=jnp.asarray(monotone_constraints, jnp.int32),
            mono_intermediate=(params.monotone_constraints_method
                               in ("intermediate", "advanced")),
            mono_penalty=float(params.monotone_penalty))
    cegb_kw = {}
    use_cegb = cegb is not None
    if use_cegb:
        if use_extra or ffb_k > 0:
            raise NotImplementedError(
                "the jitted grower does not combine CEGB with "
                "extra_trees / feature_fraction_bynode")
        cegb_kw = dict(
            cegb_coupled=(None if cegb.coupled is None
                          else jnp.asarray(cegb.coupled, jnp.float32)),
            cegb_lazy=(None if cegb.lazy is None
                       else jnp.asarray(cegb.lazy, jnp.float32)),
            cegb_used0=jnp.asarray(cegb.feature_used_in_split),
            cegb_data0=(None if cegb.lazy is None
                        else cegb.feature_used_in_data),
            cegb_tradeoff=float(cegb.tradeoff),
            cegb_split_pen=float(cegb.penalty_split))
    out = _grow_tree_jit(
        binned, num_bins_per_feat, grad, hess, int(max_num_bins),
        int(params.num_leaves), int(params.max_depth), row_mask,
        params.lambda_l1, params.lambda_l2,
        float(params.min_data_in_leaf), params.min_sum_hessian_in_leaf,
        params.min_gain_to_split,
        nan_mask=None if nan_mask is None else jnp.asarray(nan_mask),
        efb_maps=efb_maps,
        hist_B=0 if efb is None else int(efb.max_bins_hist),
        hist_binned=None if efb is None else efb.binned_hist,
        gain_mult=(None if params.feature_contri is None
                   else jnp.asarray(params.feature_contri)),
        path_smooth=params.path_smooth, use_smoothing=use_smoothing,
        mds=mds, use_bounds=use_bounds,
        rng_key=rng_key, use_extra=use_extra, ffb_k=ffb_k,
        ic_groups=ic_groups,
        cat_feature_mask=(jnp.asarray(categorical_mask, bool)
                          if has_cat else None),
        max_cat_threshold=int(max_cat_threshold),
        cat_l2=float(params.cat_l2), cat_smooth=float(params.cat_smooth),
        min_data_per_group=float(params.min_data_per_group),
        max_cat_to_onehot=int(params.max_cat_to_onehot),
        forced_ops=flatten_forced_splits(forced_splits, params.num_leaves),
        **mono_kw, **cegb_kw)
    if use_cegb:
        out, cegb_used_out, cegb_data_out = out[:14], out[14], out[15]
        cegb.feature_used_in_split = np.asarray(cegb_used_out)
        if cegb.lazy is not None:
            cegb.feature_used_in_data = cegb_data_out
    # ONE device->host transfer for all outputs INCLUDING row_leaf
    # (separate np.asarray fetches each cost a full round trip over the
    # TPU tunnel; callers only ever consume row_leaf on the host)
    (feature, thresh, left, right, leaf_value, is_leaf, cnt, depth,
     num_leaves, dleft, sgain, iscat, catmask, row_leaf) = \
        jax.device_get(out)
    max_nodes = 2 * params.num_leaves - 1
    tree = Tree(split_feature=np.asarray(feature),
                threshold=np.zeros(max_nodes),
                threshold_bin=np.asarray(thresh),
                left=np.asarray(left), right=np.asarray(right),
                leaf_value=np.asarray(leaf_value, np.float64),
                is_leaf=np.asarray(is_leaf),
                node_count=np.asarray(cnt, np.float64),
                is_categorical=np.asarray(iscat),
                cat_mask=np.asarray(catmask),
                split_gain=np.asarray(sgain, np.float64),
                default_left=np.asarray(dleft),
                num_leaves=int(num_leaves),
                max_depth_used=int(np.asarray(depth).max(initial=1)))
    # keep the device-resident STRUCTURE arrays for per-tree prediction
    # (avoids re-uploading every iteration; leaf values mutate afterwards
    # via shrinkage / Newton updates, so they are always re-sent)
    tree._dev = dict(feature=out[0], thresh=out[1], left=out[2],
                     right=out[3], dleft=out[9])
    return tree, row_leaf


@partial(jax.jit, static_argnums=(5,))
def predict_tree_binned(binned, feature, threshold_bin, left, right,
                        max_depth: int, leaf_value, default_left=None):
    """Evaluate one tree on binned data via fixed-point traversal.

    ``default_left`` [M]: False sends the NA bin (bin 0 of a feature with
    missing values — the grower only clears the flag on such nodes) right.
    """
    n = binned.shape[0]
    node = jnp.zeros(n, dtype=jnp.int32)

    def step(_, node):
        f = feature[node]
        t = threshold_bin[node]
        vals = binned[jnp.arange(n), f]
        go_left = vals <= t
        if default_left is not None:
            go_left &= default_left[node] | (vals != 0)
        return jnp.where(go_left, left[node], right[node])

    node = jax.lax.fori_loop(0, max_depth, step, node)
    return leaf_value[node], node


@partial(jax.jit, static_argnums=(6,))
def predict_tree_raw(X, feature, threshold, left, right, leaf_value,
                     max_depth: int, default_left=None):
    """Evaluate one tree on raw feature values (value <= threshold -> left);
    NaN routes by the node's learned ``default_left`` direction."""
    n = X.shape[0]
    node = jnp.zeros(n, dtype=jnp.int32)

    def step(_, node):
        f = feature[node]
        t = threshold[node]
        vals = X[jnp.arange(n), f]
        go_left = vals <= t
        if default_left is not None:
            go_left = jnp.where(jnp.isnan(vals), default_left[node], go_left)
        return jnp.where(go_left, left[node], right[node])

    node = jax.lax.fori_loop(0, max_depth, step, node)
    return leaf_value[node], node


@partial(jax.jit, static_argnums=(8,))
def predict_tree_mixed(X_num, cat_bins, feature, threshold, is_cat, cat_mask,
                       left, right, max_depth: int, leaf_value,
                       default_left=None):
    """Tree evaluation with mixed numerical/categorical splits on raw values.

    ``cat_bins`` [n, F] holds the category-bin index for categorical columns
    (0 elsewhere); numerical columns compare against real thresholds.
    """
    n = X_num.shape[0]
    node = jnp.zeros(n, dtype=jnp.int32)
    rows = jnp.arange(n)

    def step(_, node):
        f = feature[node]
        vals = X_num[rows, f]
        num_left = vals <= threshold[node]
        if default_left is not None:
            num_left = jnp.where(jnp.isnan(vals), default_left[node],
                                 num_left)
        cat_left = cat_mask[node, cat_bins[rows, f]]
        go_left = jnp.where(is_cat[node], cat_left, num_left)
        return jnp.where(go_left, left[node], right[node])

    node = jax.lax.fori_loop(0, max_depth, step, node)
    return leaf_value[node], node


@partial(jax.jit, static_argnums=(7,))
def predict_tree_binned_mixed(binned, feature, threshold_bin, is_cat,
                              cat_mask, left, right, max_depth: int,
                              leaf_value, default_left=None):
    """Binned-data evaluation with categorical splits."""
    n = binned.shape[0]
    node = jnp.zeros(n, dtype=jnp.int32)
    rows = jnp.arange(n)

    def step(_, node):
        f = feature[node]
        b = binned[rows, f]
        num_left = b <= threshold_bin[node]
        if default_left is not None:
            num_left &= default_left[node] | (b != 0)
        cat_left = cat_mask[node, b]
        go_left = jnp.where(is_cat[node], cat_left, num_left)
        return jnp.where(go_left, left[node], right[node])

    node = jax.lax.fori_loop(0, max_depth, step, node)
    return leaf_value[node], node


def fit_linear_leaves(tree: Tree, X: np.ndarray, row_leaf: np.ndarray,
                      grad: np.ndarray, hess: np.ndarray,
                      linear_lambda: float = 0.0):
    """Fit ridge linear models in the leaves (reference
    ``LinearTreeLearner``): per leaf, minimize
    sum_i [g_i v(x_i) + 1/2 h_i v(x_i)^2] over v(x) = c + w'x_path.

    Features used: the split features on the root-to-leaf path. Mutates the
    tree in place (leaf_value holds the constant, lin_* the linear parts).
    """
    M = len(tree.is_leaf)
    # path features per leaf
    parents = {}
    for node in range(M):
        if not tree.is_leaf[node]:
            parents[tree.left[node]] = node
            parents[tree.right[node]] = node
    leaf_nodes = np.flatnonzero(tree.is_leaf)
    max_k = 0
    path_feats = {}
    for leaf in leaf_nodes:
        feats = []
        node = leaf
        while node in parents:
            node = parents[node]
            f = int(tree.split_feature[node])
            if (tree.is_categorical is None
                    or not tree.is_categorical[node]) and f not in feats:
                feats.append(f)
        path_feats[leaf] = feats
        max_k = max(max_k, len(feats))
    if max_k == 0:
        return tree
    lin_features = np.full((M, max_k), -1, dtype=np.int32)
    lin_coefs = np.zeros((M, max_k), dtype=np.float64)
    rl = np.asarray(row_leaf)
    for leaf in leaf_nodes:
        feats = path_feats[leaf]
        rows = np.flatnonzero(rl == leaf)
        if len(feats) == 0 or len(rows) < len(feats) + 2:
            continue
        Xl = X[np.ix_(rows, feats)]
        # standardize for conditioning
        mu = Xl.mean(axis=0)
        sd = Xl.std(axis=0) + 1e-12
        Xs = np.column_stack([np.ones(len(rows)), (Xl - mu) / sd])
        h = hess[rows]
        g = grad[rows]
        A = Xs.T @ (Xs * h[:, None]) + (linear_lambda + 1e-6) * np.eye(
            Xs.shape[1])
        b = -Xs.T @ g
        try:
            beta = np.linalg.solve(A, b)
        except np.linalg.LinAlgError:
            continue
        coefs = beta[1:] / sd
        const = beta[0] - np.dot(coefs, mu)
        lin_features[leaf, :len(feats)] = feats
        lin_coefs[leaf, :len(feats)] = coefs
        tree.leaf_value[leaf] = const
    tree.lin_features = lin_features
    tree.lin_coefs = lin_coefs
    return tree


@partial(jax.jit, static_argnums=(8,))
def predict_tree_linear(X_num, cat_bins, feature, threshold, is_cat, cat_mask,
                        left, right, max_depth: int, leaf_value,
                        lin_features, lin_coefs, default_left=None):
    """Traverse + evaluate linear leaf models."""
    n = X_num.shape[0]
    node = jnp.zeros(n, dtype=jnp.int32)
    rows = jnp.arange(n)

    def step(_, node):
        f = feature[node]
        vals = X_num[rows, f]
        num_left = vals <= threshold[node]
        if default_left is not None:
            num_left = jnp.where(jnp.isnan(vals), default_left[node],
                                 num_left)
        cat_left = cat_mask[node, cat_bins[rows, f]]
        go_left = jnp.where(is_cat[node], cat_left, num_left)
        return jnp.where(go_left, left[node], right[node])

    node = jax.lax.fori_loop(0, max_depth, step, node)
    vals = leaf_value[node]
    K = lin_features.shape[1]
    for k in range(K):
        f = lin_features[node, k]
        contrib = jnp.where(f >= 0,
                            lin_coefs[node, k] * X_num[rows,
                                                       jnp.maximum(f, 0)],
                            0.0)
        vals = vals + contrib
    return vals, node
