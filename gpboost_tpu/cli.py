"""Config-file driven CLI (reference ``src/LightGBM/main.cpp`` ->
``Application``: tasks train / predict; config files like
``examples/regression/train.conf``).

Usage:  gpboost-tpu config=train.conf [key=value ...]
"""
from __future__ import annotations

import sys

import numpy as np


def parse_config(argv):
    """key=value args; 'config=' loads a conf file first
    (``application.cpp:52`` LoadParameters)."""
    params = {}
    conf_file = None
    for a in argv:
        if "=" not in a:
            continue
        k, v = a.split("=", 1)
        if k.strip() == "config":
            conf_file = v.strip()
        else:
            params[k.strip()] = v.strip()
    file_params = {}
    if conf_file:
        with open(conf_file) as f:
            for line in f:
                line = line.split("#", 1)[0].strip()
                if not line or "=" not in line:
                    continue
                k, v = line.split("=", 1)
                file_params[k.strip()] = v.strip()
    file_params.update(params)  # CLI overrides file
    return file_params


def _coerce(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    return v


def load_data(path: str, has_header: bool, label_column: str):
    """CSV/TSV loader: native multithreaded parser (reference io/parser.cpp
    equivalent) with numpy fallback."""
    with open(path) as f:
        first = f.readline()
    delimiter = "\t" if "\t" in first else ","
    from gpboost_tpu.native import load_table
    data = load_table(path, sep=delimiter, has_header=has_header)
    label_idx = 0
    if label_column.startswith("name:"):
        names = first.strip().split(delimiter)
        label_idx = names.index(label_column[5:])
    elif label_column:
        label_idx = int(label_column)
    y = data[:, label_idx]
    X = np.delete(data, label_idx, axis=1)
    return X, y


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    raw = parse_config(argv)
    params = {k: _coerce(v) for k, v in raw.items()}
    task = params.pop("task", "train")
    has_header = bool(params.pop("header", False))
    label_column = str(params.pop("label_column", "0") or "0")

    import gpboost_tpu as gpb

    if task == "train":
        data_path = params.pop("data")
        valid_path = params.pop("valid_data", params.pop("valid", None))
        num_rounds = int(params.pop("num_iterations",
                                    params.pop("num_trees", 100)))
        out_model = params.pop("output_model", "GPBoost_model.json")
        X, y = load_data(data_path, has_header, label_column)
        ds = gpb.Dataset(X, label=y, params=params)
        valid_sets = None
        if valid_path:
            Xv, yv = load_data(str(valid_path), has_header, label_column)
            valid_sets = [ds.create_valid(Xv, label=yv)]
        bst = gpb.train(params, ds, num_boost_round=num_rounds,
                        valid_sets=valid_sets,
                        verbose_eval=10 if valid_sets else False)
        bst.save_model(out_model)
        print(f"Finished training. Model saved to {out_model}")
    elif task in ("predict", "prediction"):
        data_path = params.pop("data")
        model_path = params.pop("input_model", "GPBoost_model.json")
        out_result = params.pop("output_result", "GPBoost_predict_result.txt")
        X, _ = load_data(data_path, has_header, label_column)
        bst = gpb.Booster(model_file=model_path)
        # prediction-task params (config.h:647-675)
        num_it = int(params.pop("num_iteration_predict", -1))
        start_it = int(params.pop("start_iteration_predict", 0))
        kwargs = {}
        if num_it > 0:
            kwargs["num_iteration"] = num_it
        if start_it > 0:
            kwargs["start_iteration"] = start_it
        if bool(params.pop("predict_leaf_index", False)):
            pred = bst.predict(X, pred_leaf=True, **kwargs)
        elif bool(params.pop("predict_contrib", False)):
            pred = bst.predict(X, pred_contrib=True, **kwargs)
        elif bool(params.pop("predict_raw_score", False)):
            pred = bst.predict(X, raw_score=True, **kwargs)
        else:
            pred = bst.predict(X, **kwargs)
        np.savetxt(out_result, np.asarray(pred))
        print(f"Finished prediction. Results saved to {out_result}")
    elif task == "refit":
        # refit leaf values on new data keeping tree structures
        # (reference task=refit, config.h:108)
        data_path = params.pop("data")
        model_path = params.pop("input_model", "GPBoost_model.json")
        out_model = params.pop("output_model", "GPBoost_model_refit.json")
        decay = float(params.pop("refit_decay_rate", 0.9))
        X, y = load_data(data_path, has_header, label_column)
        bst = gpb.Booster(model_file=model_path)
        bst.refit(X, y, decay_rate=decay)
        bst.save_model(out_model)
        print(f"Finished refit. Model saved to {out_model}")
    elif task == "convert_model":
        # reference task converting a model file to if-else source
        # (config.h:240-244,802-813)
        model_path = params.pop("input_model", "GPBoost_model.json")
        out_file = params.pop("convert_model", "gpboost_prediction.c")
        bst = gpb.Booster(model_file=model_path)
        from gpboost_tpu.boosting.convert import save_model_to_c
        save_model_to_c(bst, out_file)
        print(f"Finished converting model. Source saved to {out_file}")
    else:
        raise ValueError(f"Unknown task: {task}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
