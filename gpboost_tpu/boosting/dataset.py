"""Dataset: binned feature store for histogram-based tree boosting.

TPU-native equivalent of the reference's ``Dataset``/``BinMapper`` stack
(``src/LightGBM/io/bin.cpp`` quantile binning, ``dataset.h:283``): features are
quantile-binned once on the host into a dense ``[n, F]`` uint8/int32 matrix
that lives on device; all subsequent histogram work is device-side. Dense
uint8 bins replace the reference's dense/sparse/4-bit bin polymorphism — on
TPU a single dense layout feeds the histogram kernels best.

Exclusive Feature Bundling (EFB, ``dataset.cpp:53-297``
``GetConflictCount``/``FindGroups``): mutually exclusive sparse features
(never simultaneously non-default) merge into one histogram column with
per-member bin offsets, shrinking the histogram build — the hot loop — from
F columns to G bundles. The TPU variant is LOSSLESS-only
(``max_conflict_rate=0``): per-feature [F, B] histograms are reconstructed
EXACTLY from bundle histograms (gather + default-bin slot = leaf_total minus
the non-default mass), so split finding is unchanged. The original ``[n, F]``
bins are kept for row partitioning and train-data prediction.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

MAX_BIN_DEFAULT = 255


class EFBInfo:
    """Exclusive-feature-bundle layout (lossless; ``dataset.cpp:53-297``).

    ``binned_hist`` [n, G] feeds histogram builds; per-feature [F, B]
    histograms are reconstructed exactly with ``src_col``/``src_bin``
    gathers plus the default-bin correction (``fix_mask`` features get
    leaf_total - non-default mass in their ``default_bin`` slot). The
    original [n, F] bins stay authoritative for partitioning/prediction.
    """

    def __init__(self, binned_hist, num_bins_hist, src_col, src_bin,
                 default_bin, fix_mask, n_multi_bundles):
        self.binned_hist = binned_hist          # jnp [n, G] int32
        self.num_bins_hist = num_bins_hist      # np  [G]
        self.max_bins_hist = int(num_bins_hist.max())
        self.src_col = jnp.asarray(src_col)     # [F]
        self.src_bin = jnp.asarray(src_bin)     # [F, B]
        self.default_bin = jnp.asarray(default_bin)  # [F]
        self.fix_mask = jnp.asarray(fix_mask)   # [F] bool
        self.n_multi_bundles = n_multi_bundles


def build_efb(binned, num_bins, categorical, max_bin,
              max_bundle_bins=256, min_saving=0.2):
    """Greedy lossless bundling (``FindGroups``/``GetConflictCount`` with
    ``max_conflict_rate=0``): two features bundle iff no row has both away
    from their most-frequent ('default') bin. Conflict tests run on packed
    bitsets. Returns None when bundling would save < ``min_saving`` of the
    histogram columns (dense data keeps the classic exact path untouched)."""
    n, F = binned.shape
    default_bin = np.zeros(F, np.int32)
    for f in range(F):
        bc = np.bincount(binned[:, f], minlength=int(num_bins[f]))
        default_bin[f] = int(np.argmax(bc))
    act = binned != default_bin[None, :]
    act_cnt = act.sum(axis=0)
    bits = np.packbits(act, axis=0)             # [ceil(n/8), F]
    eligible = np.ones(F, bool)
    for f in categorical:
        eligible[f] = False
    # sparse features only are worth bundling (dense ones conflict anyway)
    eligible &= act_cnt <= 0.5 * n
    order = np.argsort(-act_cnt)
    bundles = []                                # (members, bits, bins_used)
    for f in order:
        if not eligible[f]:
            continue
        extra = int(num_bins[f]) - 1
        placed = False
        for b in bundles:
            if (b[2] + extra <= max_bundle_bins
                    and not np.any(b[1] & bits[:, f])):
                b[0].append(int(f))
                b[1] |= bits[:, f]
                b[2] += extra
                placed = True
                break
        if not placed:
            bundles.append([[int(f)], bits[:, f].copy(), 1 + extra])
    multi = [b for b in bundles if len(b[0]) > 1]
    n_saved = sum(len(b[0]) - 1 for b in multi)
    if n_saved < min_saving * F:
        return None
    # layout: multi-member bundles first, then singletons (identity columns)
    in_multi = np.zeros(F, bool)
    for b in multi:
        in_multi[b[0]] = True
    B = int(num_bins.max())
    G = len(multi) + int((~in_multi).sum())
    src_col = np.zeros(F, np.int32)
    src_bin = np.full((F, B), -1, np.int32)
    fix_mask = np.zeros(F, bool)
    num_bins_hist = np.zeros(G, np.int64)
    binned_hist = np.zeros((n, G), np.int32)
    g = 0
    for members, _, bins_used in multi:
        off = 1
        col = np.zeros(n, np.int32)
        for f in members:
            nb = int(num_bins[f])
            df = int(default_bin[f])
            ranks = np.arange(nb) - (np.arange(nb) > df)
            pos = off + ranks                   # per-original-bin position
            src_col[f] = g
            src_bin[f, :nb] = pos
            src_bin[f, df] = -1                 # default slot reconstructed
            fix_mask[f] = True
            col = np.where(act[:, f], pos[binned[:, f]], col)
            off += nb - 1
        num_bins_hist[g] = bins_used
        binned_hist[:, g] = col
        g += 1
    for f in np.flatnonzero(~in_multi):
        nb = int(num_bins[f])
        src_col[f] = g
        src_bin[f, :nb] = np.arange(nb)
        num_bins_hist[g] = nb
        binned_hist[:, g] = binned[:, f]
        g += 1
    return EFBInfo(jnp.asarray(binned_hist), num_bins_hist, src_col,
                   src_bin, default_bin, fix_mask, len(multi))


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
        self.tree_learner = (params or {}).get("tree_learner", "data")
        self.pandas_categorical = None
        p = params or {}
        self._enable_bundle = bool(p.get(
            "enable_bundle", p.get("is_enable_bundle", True)))
        # params-dict form of categorical_feature ("0,1,2" or "name:a,b";
        # reference config.h:631) when the kwarg is not given
        if categorical_feature is None and p.get("categorical_feature"):
            cf = p["categorical_feature"]
            if isinstance(cf, str):
                if cf.startswith("name:"):
                    cf = [s.strip() for s in cf[5:].split(",") if s.strip()]
                else:
                    cf = [int(s) for s in cf.split(",") if s.strip()]
            categorical_feature = cf
        if isinstance(data, str):
            if data.endswith(".bin") or data.endswith(".npz"):
                # binary dataset file (reference Dataset::SaveBinaryFile /
                # ``save_binary``): bins + bin mapping + metadata round-trip
                self._load_binary(data, label, weight, init_score, group)
                return
            # file path: native multithreaded CSV/TSV parser
            from gpboost_tpu.native import load_table
            data = load_table(data)
        # pandas DataFrame / scipy.sparse marshalling (reference
        # basic.py:543 _data_from_pandas, :847/:1396 csr/csc paths)
        from gpboost_tpu.boosting.compat_data import (marshal_label,
                                                      marshal_matrix)
        data, fn_m, cat_m, self.pandas_categorical = marshal_matrix(
            data,
            feature_name if feature_name is not None else "auto",
            categorical_feature if categorical_feature is not None
            else "auto",
            pandas_categorical=(getattr(reference, "pandas_categorical",
                                        None)
                                if reference is not None else None))
        if feature_name is None and fn_m is not None:
            feature_name = fn_m
        if cat_m is not None:
            categorical_feature = cat_m
        data = np.asarray(data, dtype=np.float64)
        if data.ndim == 1:
            data = data[:, None]
        # missing-value policy (config.h use_missing / zero_as_missing):
        # applied to the raw matrix so binning, partitioning and
        # train-data prediction all see the same values; Booster.predict
        # re-applies it to new data (params travel in the model file)
        self.use_missing = bool(p.get("use_missing", True))
        self.zero_as_missing = bool(p.get("zero_as_missing", False))
        if not self.use_missing:
            data = np.where(np.isfinite(data), data, 0.0)
        elif self.zero_as_missing:
            data = np.where(data == 0.0, np.nan, data)
        self.num_data, self.num_features = data.shape
        self.raw_data = data
        label = marshal_label(label)
        self.label = None if label is None else np.asarray(
            label, dtype=np.float64).ravel()
        self.weight = None if weight is None else np.asarray(
            weight, dtype=np.float64).ravel()
        self.init_score = None if init_score is None else np.asarray(
            init_score, dtype=np.float64).ravel()
        self.group = group
        self.max_bin = max_bin
        mbf = p.get("max_bin_by_feature")
        self.max_bin_by_feature = (None if not mbf else
                                   np.asarray(mbf, dtype=np.int64))
        self.min_data_in_bin = int(p.get("min_data_in_bin", 3))
        # forced bin boundaries (config.h:596 forcedbins_filename; JSON
        # [{"feature": i, "bin_upper_bound": [...]}, ...] as in LightGBM's
        # forced_bins docs): listed bounds are guaranteed bin edges, the
        # rest fill up from the quantile bins
        self.forced_bins = {}
        fb = p.get("forcedbins_filename", "")
        if fb:
            import json as _json
            with open(fb) as fh:
                for ent in _json.load(fh):
                    self.forced_bins[int(ent["feature"])] = np.asarray(
                        ent["bin_upper_bound"], dtype=np.float64)
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
        mbf = getattr(self, "max_bin_by_feature", None)
        for f in range(self.num_features):
            # per-feature bin-count override (max_bin_by_feature,
            # config.h:591; <= 0 entries fall back to the global max_bin)
            max_bin = self.max_bin
            if mbf is not None and f < len(mbf) and int(mbf[f]) > 1:
                max_bin = int(mbf[f])
            col = self.raw_data[:, f]
            finite = col[np.isfinite(col)]
            if f not in self.categorical_feature:
                self.has_nan[f] = len(finite) < len(col)
            if f in self.categorical_feature:
                cats = np.unique(finite)
                self.cat_maps[f] = {v: i for i, v in enumerate(cats)}
                self.bin_upper_bounds.append(cats)  # category values
                self.num_bins[f] = min(len(cats), max_bin)
                continue
            uniq = np.unique(finite)
            if len(uniq) <= max_bin - 1:
                # one bin per distinct value; boundaries between values
                ub = (uniq[:-1] + uniq[1:]) / 2.0 if len(uniq) > 1 else np.array([])
                ub = np.append(ub, np.inf)
            else:
                qs = np.quantile(finite, np.linspace(0, 1, max_bin),
                                 method="linear")
                ub = np.unique(qs[1:-1])
                ub = np.append(ub, np.inf)
            ub = self._merge_small_bins(ub, finite)
            forced = getattr(self, "forced_bins", {}).get(f)
            if forced is not None and len(forced):
                # forced edges always present; quantile edges fill the
                # remaining budget (smallest-first drop on overflow)
                ub = np.unique(np.concatenate([forced, ub]))
                over = len(ub) - (max_bin - 1)
                if over > 0:
                    keep = np.isin(ub, forced) | np.isinf(ub)
                    drop_idx = np.flatnonzero(~keep)[:over]
                    ub = np.delete(ub, drop_idx)
            self.bin_upper_bounds.append(ub.astype(np.float64))
            self.num_bins[f] = len(ub) + (1 if self.has_nan[f] else 0)

    def _merge_small_bins(self, ub, finite):
        """Merge adjacent bins holding fewer than ``min_data_in_bin``
        samples (LightGBM ``GreedyFindBin``'s per-bin minimum,
        config.h min_data_in_bin, io/bin.cpp): left-to-right accumulation,
        the tail bin merges backward if underfull."""
        mdb = getattr(self, "min_data_in_bin", 3)
        if mdb <= 1 or len(ub) <= 1:
            return ub
        idx = np.searchsorted(ub, finite, side="left")
        counts = np.bincount(idx, minlength=len(ub))
        merged = []
        acc = 0
        for i, c in enumerate(counts[:len(ub)]):
            acc += int(c)
            if acc >= mdb or i == len(ub) - 1:
                merged.append(ub[i])
                last_cnt = acc
                acc = 0
        if len(merged) > 1 and last_cnt < mdb:
            merged.pop(-2)  # fold the underfull tail into its neighbor
        return np.asarray(merged, dtype=np.float64)

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
        # Exclusive Feature Bundling (lossless; see module docstring)
        self.efb = None
        if (self._enable_bundle and F >= 2
                and self.tree_learner != "feature"):
            self.efb = build_efb(binned, np.asarray(self.num_bins),
                                 sorted(self.categorical_feature),
                                 self.max_bin)
        # under an active device mesh the binned matrix lives row-sharded:
        # every histogram build / tree-grower program consuming it compiles
        # as SPMD (the DataParallelTreeLearner's ReduceScatter/Allreduce
        # pattern, data_parallel_tree_learner.cpp:131-175, becomes XLA
        # collectives). Rows pad up to a device multiple; the Booster masks
        # the padding rows out of every histogram (num_data stays logical).
        from gpboost_tpu import parallel as par
        mesh = par.active_mesh()
        self.num_bins_grower = self.num_bins
        self._shard_mesh = mesh
        self._shard_axis = par.data_axis() if mesh is not None else None
        if mesh is not None:
            ndev = int(np.prod(mesh.devices.shape))
            if self.tree_learner == "feature":
                # feature-parallel layout (the reference's
                # FeatureParallelTreeLearner, feature_parallel_tree_learner.cpp):
                # shard the FEATURE axis — each device builds the histograms
                # and split scans of its feature shard; padding features have
                # zero bins so they can never be selected
                import jax
                from jax.sharding import NamedSharding, PartitionSpec as P
                padf = (-F) % ndev
                if padf:
                    self.binned = jnp.concatenate(
                        [self.binned,
                         jnp.zeros((n, padf), dtype=self.binned.dtype)],
                        axis=1)
                    self.num_bins_grower = np.concatenate(
                        [self.num_bins, np.zeros(padf, self.num_bins.dtype)])
                self.binned = jax.device_put(
                    self.binned,
                    NamedSharding(mesh, P(None, par.data_axis())))
            elif self.tree_learner == "voting":
                # voting-parallel (PV-Tree): rows shard like data-parallel,
                # but the grower routes histogram aggregation through the
                # per-leaf top-k feature vote (parallel/mesh.py
                # make_voting_context) so only the globally selected
                # 2*top_k features' histograms cross ICI
                # (voting_parallel_tree_learner.cpp:151,322)
                pad = (-n) % ndev
                if pad:
                    self.binned = jnp.concatenate(
                        [self.binned,
                         jnp.zeros((pad, F), dtype=self.binned.dtype)])
                self.binned = par.shard_rows(self.binned)
            else:
                pad = (-n) % ndev
                if pad:
                    self.binned = jnp.concatenate(
                        [self.binned,
                         jnp.zeros((pad, F), dtype=self.binned.dtype)])
                self.binned = par.shard_rows(self.binned)
            if self.efb is not None and self.tree_learner != "feature":
                bh = self.efb.binned_hist
                pad = (-n) % ndev
                if pad:
                    bh = jnp.concatenate(
                        [bh, jnp.zeros((pad, bh.shape[1]), dtype=bh.dtype)])
                self.efb.binned_hist = par.shard_rows(bh)
        self.max_num_bins = int(self.num_bins.max()) if F > 0 else 1

    # ------------------------------------------------------------------
    def save_binary(self, filename: str):
        """Serialize the BINNED dataset + bin mapping + metadata
        (reference ``Dataset::SaveBinaryFile`` / ``Dataset.save_binary``,
        basic.py). Reload with ``Dataset("file.bin")``."""
        payload = dict(
            binned=np.asarray(self.binned)[:self.num_data],
            raw_data=self.raw_data,
            num_bins=self.num_bins,
            has_nan=self.has_nan,
            max_bin=np.asarray(self.max_bin),
            feature_name=np.asarray(self.feature_name, dtype=object),
            categorical_feature=np.asarray(self.categorical_feature,
                                           dtype=np.int64),
        )
        for f, ub in enumerate(self.bin_upper_bounds):
            payload[f"ub_{f}"] = np.asarray(ub, dtype=np.float64)
        for f, mp in (self.cat_maps or {}).items():
            keys = np.asarray(list(mp.keys()), dtype=np.float64)
            vals = np.asarray(list(mp.values()), dtype=np.int64)
            payload[f"cat_{f}"] = np.stack([keys, vals.astype(np.float64)])
        if self.label is not None:
            payload["label"] = self.label
        if self.weight is not None:
            payload["weight"] = self.weight
        if self.init_score is not None:
            payload["init_score"] = self.init_score
        if self.group is not None:
            payload["group"] = np.asarray(self.group)
        with open(filename, "wb") as f:
            np.savez_compressed(f, **payload)
        return self

    def _load_binary(self, filename, label, weight, init_score, group):
        z = np.load(filename, allow_pickle=True)
        binned = z["binned"]
        self.num_data, self.num_features = binned.shape
        self.raw_data = z["raw_data"]
        self.num_bins = z["num_bins"]
        self.has_nan = z["has_nan"]
        self.max_bin = int(z["max_bin"])
        self.feature_name = [str(x) for x in z["feature_name"]]
        self.categorical_feature = [int(x)
                                    for x in z["categorical_feature"]]
        self.bin_upper_bounds = [z[f"ub_{f}"]
                                 for f in range(self.num_features)]
        self.cat_maps = {}
        for f in self.categorical_feature:
            if f"cat_{f}" in z:
                keys, vals = z[f"cat_{f}"]
                self.cat_maps[f] = {k: int(v) for k, v in zip(keys, vals)}
        self.label = (np.asarray(label, np.float64).ravel()
                      if label is not None else
                      (z["label"] if "label" in z else None))
        self.weight = (np.asarray(weight, np.float64).ravel()
                       if weight is not None else
                       (z["weight"] if "weight" in z else None))
        self.init_score = (np.asarray(init_score, np.float64).ravel()
                           if init_score is not None else
                           (z["init_score"] if "init_score" in z else None))
        self.group = (group if group is not None
                      else (z["group"] if "group" in z else None))
        self.binned = jnp.asarray(binned)
        self.max_num_bins = (int(self.num_bins.max())
                             if self.num_features > 0 else 1)
        self._shard_mesh = None
        self._shard_axis = None
        self.num_bins_grower = self.num_bins
        # EFB layout is derived state: rebuild from the loaded bins
        self.efb = (build_efb(np.asarray(binned), np.asarray(self.num_bins),
                              sorted(self.categorical_feature), self.max_bin)
                    if self._enable_bundle and self.num_features >= 2
                    else None)

    # ------------------------------------------------------------------
    # generic field access (reference Dataset.get_field/set_field)
    _FIELDS = ("label", "weight", "init_score", "group")

    def set_field(self, field_name: str, data):
        if field_name not in self._FIELDS:
            raise ValueError(f"unknown dataset field '{field_name}'")
        if data is None:
            setattr(self, field_name, None)
        elif field_name == "group":
            self.group = np.asarray(data)
        else:
            setattr(self, field_name,
                    np.asarray(data, dtype=np.float64).ravel())
        return self

    def get_field(self, field_name: str):
        if field_name not in self._FIELDS:
            raise ValueError(f"unknown dataset field '{field_name}'")
        return getattr(self, field_name)

    def set_init_score(self, init_score):
        return self.set_field("init_score", init_score)

    def get_init_score(self):
        return self.init_score

    def set_group(self, group):
        return self.set_field("group", group)

    def get_group(self):
        return self.group

    def num_data_rows(self):
        return self.num_data

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

    # ------------------------------------------------------------------
    # convenience surface (reference ``Dataset``, basic.py:1180)
    def get_data(self):
        return self.raw_data

    def get_feature_name(self):
        return list(self.feature_name)

    def get_params(self):
        return {"max_bin": self.max_bin,
                "categorical_feature": list(self.categorical_feature),
                "tree_learner": self.tree_learner}

    def get_ref_chain(self, ref_limit=100):
        chain = [self]
        ref = getattr(self, "_reference", None)
        while ref is not None and len(chain) < ref_limit:
            chain.append(ref)
            ref = getattr(ref, "_reference", None)
        return set(chain)

    def set_feature_name(self, feature_name):
        if len(feature_name) != self.num_features:
            raise ValueError("feature_name length must equal num_features")
        self.feature_name = list(feature_name)
        return self

    def set_categorical_feature(self, categorical_feature):
        """Re-bin with a new categorical-feature set
        (``Dataset.set_categorical_feature``)."""
        new = sorted(set(categorical_feature or []))
        if new == self.categorical_feature:
            return self
        self.categorical_feature = new
        self._find_bins()
        self._bin_data()
        return self

    def set_reference(self, reference):
        """Adopt another Dataset's bin mapping (``Dataset.set_reference``)."""
        self.bin_upper_bounds = reference.bin_upper_bounds
        self.num_bins = reference.num_bins
        self.categorical_feature = reference.categorical_feature
        self.cat_maps = reference.cat_maps
        self.has_nan = reference.has_nan
        self._reference = reference
        self._bin_data()
        return self

    def subset(self, used_indices, params=None):
        """Row-subset Dataset sharing this Dataset's bin mapping
        (``Dataset.subset``)."""
        idx = np.asarray(used_indices, dtype=np.int64)
        sub = Dataset(self.raw_data[idx],
                      label=None if self.label is None else self.label[idx],
                      reference=self,
                      weight=None if self.weight is None
                      else self.weight[idx],
                      init_score=None if self.init_score is None
                      else self.init_score[idx],
                      feature_name=self.feature_name, params=params)
        sub._reference = self
        return sub

    def add_features_from(self, other: "Dataset"):
        """Horizontally stack another Dataset's features onto this one and
        re-bin (``Dataset.add_features_from``)."""
        if other.num_data != self.num_data:
            raise ValueError("Datasets must have the same number of rows")
        self.raw_data = np.concatenate([self.raw_data, other.raw_data],
                                       axis=1)
        self.categorical_feature = sorted(
            set(self.categorical_feature)
            | {f + self.num_features for f in other.categorical_feature})
        self.feature_name = (list(self.feature_name)
                             + list(other.feature_name))
        self.num_features = self.raw_data.shape[1]
        self._find_bins()
        self._bin_data()
        return self

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
