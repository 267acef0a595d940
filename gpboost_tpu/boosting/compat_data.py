"""Input marshalling: pandas DataFrames and scipy.sparse matrices.

TPU-native counterpart of the reference's input-marshalling layer
(``python-package/gpboost/basic.py:543`` ``_data_from_pandas``, CSR/CSC
ingestion at ``basic.py:847,:1396``): DataFrames keep their column names as
feature names, pandas ``category`` dtypes are converted to integer codes with
the training-time category levels remembered (``pandas_categorical``) so
prediction maps unseen frames identically, and scipy sparse matrices are
densified (the TPU dataset layout is dense ``[n, F]`` bins — SURVEY §7
"dense-blocked over sparse" — so sparse inputs are converted up front rather
than binned via per-column iterators as the reference does).

Both :class:`~gpboost_tpu.boosting.dataset.Dataset` and
``Booster.predict`` route through :func:`marshal_matrix`.
"""
from __future__ import annotations

import numpy as np


def _is_pandas_df(data) -> bool:
    cls = type(data)
    return cls.__module__.split(".")[0] == "pandas" and cls.__name__ == "DataFrame"


def _is_pandas_series(data) -> bool:
    cls = type(data)
    return cls.__module__.split(".")[0] == "pandas" and cls.__name__ == "Series"


def _is_scipy_sparse(data) -> bool:
    mod = type(data).__module__
    return mod.startswith("scipy.sparse")


def marshal_label(label):
    """1-D float64 labels from Series/DataFrame/array (reference
    ``_label_from_pandas``, basic.py:608)."""
    if label is None:
        return None
    if _is_pandas_df(label):
        if len(label.columns) != 1:
            raise ValueError("DataFrame for label should have exactly "
                             "one column")
        label = label.iloc[:, 0]
    if _is_pandas_series(label):
        label = label.to_numpy()
    return np.asarray(label, dtype=np.float64).ravel()


def marshal_matrix(data, feature_name="auto", categorical_feature="auto",
                   pandas_categorical=None):
    """Normalize feature-matrix input.

    Returns ``(array[n, F] float64, feature_name or None,
    categorical_feature (list of int indices) or None, pandas_categorical)``.

    - pandas DataFrame: column names become feature names (when
      ``feature_name='auto'``); ``category``-dtype columns are converted to
      integer codes. On first marshalling (training) the category levels are
      recorded in ``pandas_categorical`` (list of level-lists in categorical
      column order, reference basic.py:566-586); on later calls (prediction)
      the stored levels re-map the frame so codes agree with training.
    - scipy.sparse CSR/CSC/COO: densified to float64.
    - anything else: ``np.asarray(..., float64)``.

    ``categorical_feature`` may contain column names (resolved against the
    feature names) or integer indices; ``'auto'`` selects the DataFrame's
    ``category`` columns (and nothing for plain arrays), as in the reference.
    """
    cat_out = None
    pd_cat_out = pandas_categorical
    if _is_pandas_df(data):
        import pandas as pd
        df = data
        if feature_name == "auto" or feature_name is None:
            feature_name = [str(c) for c in df.columns]
        cat_cols = [c for c in df.columns
                    if isinstance(df[c].dtype, pd.CategoricalDtype)]
        # validate remaining dtypes are numeric/bool (reference
        # _data_from_pandas bad_indices check)
        bad = [str(c) for c in df.columns
               if c not in cat_cols
               and not (pd.api.types.is_numeric_dtype(df[c].dtype)
                        or pd.api.types.is_bool_dtype(df[c].dtype))]
        if bad:
            raise ValueError(
                "DataFrame.dtypes for data must be int, float or bool. "
                "Did not expect the data types in the following fields: "
                + ", ".join(bad))
        if cat_cols:
            if pandas_categorical is None:
                # training path: record levels
                pd_cat_out = [list(df[c].cat.categories) for c in cat_cols]
                codes = {c: df[c].cat.codes for c in cat_cols}
            else:
                if len(pandas_categorical) != len(cat_cols):
                    raise ValueError(
                        "train and valid dataset categorical_feature do not "
                        "match.")
                codes = {}
                for c, levels in zip(cat_cols, pandas_categorical):
                    codes[c] = df[c].cat.set_categories(levels).cat.codes
            arr = np.empty((len(df), len(df.columns)), dtype=np.float64)
            for j, c in enumerate(df.columns):
                if c in codes:
                    v = codes[c].to_numpy().astype(np.float64)
                    v[v < 0] = np.nan        # unseen / missing categories
                    arr[:, j] = v
                else:
                    arr[:, j] = df[c].to_numpy(dtype=np.float64,
                                               na_value=np.nan)
        else:
            arr = df.to_numpy(dtype=np.float64, na_value=np.nan)
        if categorical_feature == "auto" or categorical_feature is None:
            cat_out = [list(df.columns).index(c) for c in cat_cols] or None
        else:
            cat_out = _resolve_cat(categorical_feature, feature_name)
        return arr, feature_name, cat_out, pd_cat_out

    if _is_scipy_sparse(data):
        arr = np.asarray(data.todense(), dtype=np.float64)
        if arr.ndim == 1:
            arr = arr[:, None]
    else:
        arr = np.asarray(data, dtype=np.float64)
    if feature_name == "auto":
        feature_name = None
    if categorical_feature == "auto" or categorical_feature is None:
        cat_out = None
    else:
        cat_out = _resolve_cat(categorical_feature, feature_name)
    return arr, feature_name, cat_out, pd_cat_out


def _resolve_cat(categorical_feature, feature_name):
    """Resolve a mixed list of column names / indices to integer indices
    (reference ``Dataset.set_categorical_feature`` name handling)."""
    out = []
    for c in categorical_feature:
        if isinstance(c, str):
            if not feature_name or c not in feature_name:
                raise ValueError(
                    f"Unknown categorical feature name: {c!r}")
            out.append(feature_name.index(c))
        else:
            out.append(int(c))
    return sorted(set(out))
