"""Dataset: binned feature store for histogram-based tree boosting.

TPU-native equivalent of the reference's ``Dataset``/``BinMapper`` stack
(``src/LightGBM/io/bin.cpp`` quantile binning, ``dataset.h:283``): features are
quantile-binned once on the host into a dense ``[n, F]`` uint8/int32 matrix
that lives on device; all subsequent histogram work is device-side. Dense
uint8 bins replace the reference's dense/sparse/4-bit bin polymorphism — on
TPU a single dense layout feeds the histogram kernels best; EFB bundling
(``dataset.cpp:53-297``) is unnecessary here because dense layouts don't pay
per-feature sparsity costs.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

MAX_BIN_DEFAULT = 255


class Dataset:
    """Training data container (mirrors ``gpboost.Dataset``, ``basic.py:1180``).

    Parameters
    ----------
    data : array-like [n, F]
    label : array-like [n]
    max_bin : number of histogram bins per feature (<= 255)
    categorical_feature : indices of categorical features (bin = category id)
    """

    def __init__(self, data, label=None, reference: Optional["Dataset"] = None,
                 weight=None, init_score=None, max_bin: int = MAX_BIN_DEFAULT,
                 categorical_feature: Optional[Sequence[int]] = None,
                 feature_name=None, free_raw_data: bool = False, params=None,
                 group=None):
        if params:
            max_bin = int(params.get("max_bin", max_bin))
        if isinstance(data, str):
            # file path: native multithreaded CSV/TSV parser
            from gpboost_tpu.native import load_table
            data = load_table(data)
        data = np.asarray(data, dtype=np.float64)
        if data.ndim == 1:
            data = data[:, None]
        self.num_data, self.num_features = data.shape
        self.raw_data = data
        self.label = None if label is None else np.asarray(
            label, dtype=np.float64).ravel()
        self.weight = None if weight is None else np.asarray(
            weight, dtype=np.float64).ravel()
        self.init_score = None if init_score is None else np.asarray(
            init_score, dtype=np.float64).ravel()
        self.group = group
        self.max_bin = max_bin
        self.feature_name = (list(feature_name) if feature_name is not None
                             else [f"Column_{i}" for i in range(self.num_features)])
        self.categorical_feature = sorted(set(categorical_feature or []))

        if reference is not None:
            self.bin_upper_bounds = reference.bin_upper_bounds
            self.num_bins = reference.num_bins
            self.categorical_feature = reference.categorical_feature
            self.cat_maps = reference.cat_maps
            self.has_nan = reference.has_nan
        else:
            self._find_bins()
        self._bin_data()

    # ------------------------------------------------------------------
    def _find_bins(self):
        """Quantile bin boundaries per feature (``BinMapper::FindBin``).

        Features containing missing values get an EXCLUSIVE NA bin at index 0
        (LightGBM ``MissingType::NaN`` semantics, ``io/bin.cpp``): real-value
        bins shift up by one and the split finder learns a per-node default
        direction for the NA bin.
        """
        self.bin_upper_bounds = []
        self.num_bins = np.zeros(self.num_features, dtype=np.int32)
        self.cat_maps = {}
        self.has_nan = np.zeros(self.num_features, dtype=bool)
        for f in range(self.num_features):
            col = self.raw_data[:, f]
            finite = col[np.isfinite(col)]
            if f not in self.categorical_feature:
                self.has_nan[f] = len(finite) < len(col)
            if f in self.categorical_feature:
                cats = np.unique(finite)
                self.cat_maps[f] = {v: i for i, v in enumerate(cats)}
                self.bin_upper_bounds.append(cats)  # category values
                self.num_bins[f] = min(len(cats), self.max_bin)
                continue
            uniq = np.unique(finite)
            if len(uniq) <= self.max_bin - 1:
                # one bin per distinct value; boundaries between values
                ub = (uniq[:-1] + uniq[1:]) / 2.0 if len(uniq) > 1 else np.array([])
                ub = np.append(ub, np.inf)
            else:
                qs = np.quantile(finite, np.linspace(0, 1, self.max_bin),
                                 method="linear")
                ub = np.unique(qs[1:-1])
                ub = np.append(ub, np.inf)
            self.bin_upper_bounds.append(ub.astype(np.float64))
            self.num_bins[f] = len(ub) + (1 if self.has_nan[f] else 0)

    def _bin_data(self):
        """Map raw values to bin indices. Features whose TRAINING data had
        missing values use bin 0 exclusively for NaN and shift the real-value
        bins by one (LightGBM NA-bin semantics, ``io/bin.cpp``). NaN in a
        feature without a training-time NA bin maps to the lowest bin
        (LightGBM converts missing to 0.0 when the train data had none).
        """
        n, F = self.raw_data.shape
        binned = np.zeros((n, F), dtype=np.int32)
        for f in range(F):
            col = self.raw_data[:, f]
            nan_mask = ~np.isfinite(col)
            if f in self.categorical_feature:
                lookup = self.cat_maps[f]
                vals = np.asarray([lookup.get(v, 0) for v in col], dtype=np.int32)
                binned[:, f] = np.clip(vals, 0, self.max_bin - 1)
            elif self.has_nan[f]:
                nb_real = int(self.num_bins[f]) - 1
                idx = np.searchsorted(self.bin_upper_bounds[f], col,
                                      side="left")
                idx = np.clip(idx, 0, nb_real - 1) + 1
                idx[nan_mask] = 0  # exclusive NA bin
                binned[:, f] = idx
            else:
                idx = np.searchsorted(self.bin_upper_bounds[f], col,
                                      side="left")
                idx = np.clip(idx, 0, self.num_bins[f] - 1)
                binned[:, f] = np.where(nan_mask, 0, idx)
        self.binned = jnp.asarray(binned)
        # under an active device mesh the binned matrix lives row-sharded:
        # every histogram build / tree-grower program consuming it compiles
        # as SPMD (the DataParallelTreeLearner's ReduceScatter/Allreduce
        # pattern, data_parallel_tree_learner.cpp:131-175, becomes XLA
        # collectives). Rows pad up to a device multiple; the Booster masks
        # the padding rows out of every histogram (num_data stays logical).
        from gpboost_tpu import parallel as par
        mesh = par.active_mesh()
        if mesh is not None:
            ndev = int(np.prod(mesh.devices.shape))
            pad = (-n) % ndev
            if pad:
                self.binned = jnp.concatenate(
                    [self.binned,
                     jnp.zeros((pad, F), dtype=self.binned.dtype)])
            self.binned = par.shard_rows(self.binned)
        self.max_num_bins = int(self.num_bins.max()) if F > 0 else 1

    # ------------------------------------------------------------------
    def construct(self):
        return self

    def create_valid(self, data, label=None, weight=None, init_score=None,
                     params=None):
        return Dataset(data, label=label, reference=self, weight=weight,
                       init_score=init_score)

    def set_label(self, label):
        self.label = np.asarray(label, dtype=np.float64).ravel()
        return self

    def get_label(self):
        return self.label

    def set_weight(self, weight):
        self.weight = None if weight is None else np.asarray(
            weight, dtype=np.float64).ravel()
        return self

    def get_weight(self):
        return self.weight

    def num_feature(self):
        return self.num_features

    def bin_for_threshold(self, feature: int, value: float) -> int:
        """Largest bin whose upper bound is <= value (forced splits resolve
        raw thresholds to the binned split the grower uses)."""
        ub = np.asarray(self.bin_upper_bounds[feature], dtype=np.float64)
        shift = 1 if self.has_nan[feature] else 0
        return shift + int(np.clip(np.searchsorted(ub, value, side="left"),
                                   0, len(ub) - 1))

    def threshold_value(self, feature: int, bin_idx: int) -> float:
        """Real-valued threshold for splitting feature at bin boundary
        ``bin_idx`` (rows with bin <= bin_idx go left)."""
        ub = self.bin_upper_bounds[feature]
        if self.has_nan[feature]:
            if bin_idx <= 0:
                return float(-np.inf)  # NA-only split: no finite value left
            bin_idx -= 1
        if bin_idx >= len(ub) - 1:
            return float(np.inf)
        return float(ub[bin_idx])
