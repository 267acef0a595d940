"""Generate tests/data/r_replay_manifest.json — the map of the reference
R-package testthat spec (the "real spec for the GP engine", SURVEY §4) to
the repo tests that replay each block's expected values.

Usage: python tools/gen_r_replay_manifest.py   (needs /root/reference)

The manifest records, per reference testthat file, every ``test_that`` block
with its assertion count and the repo test module(s) replaying it.
``status`` is curated here:
- "covered": the block's golden values / behavior are replayed
- "partial": the block's main flow is replayed but many expected values
  are not individually asserted
- "uncovered": no repo counterpart
- "na": not applicable by design (e.g. R-GUI plotting internals, CUDA)
tests/test_r_manifest.py validates the structure, recounts the reference
side, and ratchets the covered-assertion ratio.
"""
import json
import os
import re

BASE = "/root/reference/R-package/tests/testthat"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                   "r_replay_manifest.json")

# block-name substring -> (status, [repo test modules]); first match wins.
# Files not listed fall through to DEFAULTS.
RULES = {
    "test_GPModel_gaussian_process.R": [
        ("Gaussian process model ", "covered", ["test_gaussian_gp_golden.py"]),
        ("linear regression term", "covered", ["test_gaussian_gp_golden.py"]),
        ("two random coefficients", "covered", ["test_gp_rand_coef_golden.py"]),
        ("cluster_id", "covered", ["test_clustered.py",
                                   "test_vecchia_cluster_golden.py"]),
        ("multiple observations at the same location", "covered",
         ["test_duplicate_locations.py"]),
        ("Vecchia approximation", "covered",
         ["test_vecchia_golden.py", "test_vecchia_pred_types.py"]),
        ("Wendland", "covered", ["test_taper_wendland_golden.py"]),
        ("Tapering", "covered", ["test_taper_wendland_golden.py"]),
        ("fitc", "covered", ["test_fitc_golden.py"]),
        ("FSA", "covered", ["test_fitc_golden.py"]),
        ("VIF or Full scale Vecchia", "covered", ["test_fsva.py"]),
        ("Saving a GPModel", "covered", ["test_api_convenience.py"]),
        ("Space-time", "covered", ["test_space_time_golden.py"]),
        ("ARD", "covered", ["test_ng_ard_golden.py",
                            "test_ard_neighbor_redetermination.py"]),
        ("CUDA GPU", "na", []),   # replaced by the TPU Pallas kernels
    ],
    "test_GPModel_non_Gaussian_data.R": [
        ("Binary classification with Gaussian process model ", "covered",
         ["test_non_gaussian_golden.py", "test_capability_grid.py"]),
        ("multiple observations at the same location", "covered",
         ["test_duplicate_locations.py"]),
        ("one grouped random effects", "covered",
         ["test_non_gaussian_golden.py"]),
        ("GLMM with an offset", "covered", ["test_offset_scale.py"]),
        ("multiple grouped random effects", "covered",
         ["test_non_gaussian_golden.py"]),
        ("combined Gaussian process and grouped", "covered",
         ["test_non_gaussian_combined.py"]),
        ("Combined GP and grouped random effects model with random "
         "coefficients", "covered", ["test_vecchia_laplace_cluster_svc.py"]),
        ("cluster_id", "covered", ["test_vecchia_laplace_cluster_svc.py"]),
        ("Vecchia approximation", "covered",
         ["test_ng_matrix_golden.py", "test_vecchia_pred_types.py",
          "test_preconditioners.py"]),
        ("VIF (or Full scale Vecchia)", "covered", ["test_fsva_laplace.py"]),
        ("Wendland", "covered", ["test_taper_wendland_golden.py"]),
        ("linear predictor", "covered", ["test_non_gaussian_golden.py"]),
        ("Tapering for binary", "covered", ["test_capability_grid.py"]),
        ("FITC for binary", "covered", ["test_ng_matrix_golden.py"]),
        ("logit link", "covered", ["test_non_gaussian_golden.py"]),
        ("Poisson regression", "covered", ["test_non_gaussian_golden.py",
                                           "test_ng_matrix_golden.py"]),
        ("Gamma regression", "covered", ["test_non_gaussian_golden.py",
                                         "test_ng_matrix_golden.py"]),
        ("negative binomial regression", "covered",
         ["test_more_likelihoods_golden.py"]),
        ("Saving a GPModel", "covered", ["test_api_convenience.py"]),
        ("Space-time", "covered", ["test_space_time_golden.py"]),
        ("ARD", "covered", ["test_ng_ard_golden.py"]),
        ("t likelihood", "covered", ["test_more_likelihoods_golden.py"]),
        ("gaussian_heteroscedastic likelihood", "covered",
         ["test_heteroscedastic.py"]),
        ("beta regression", "covered", ["test_more_likelihoods_golden.py"]),
        ("negative_binomial_1", "covered",
         ["test_more_likelihoods_golden.py"]),
        ("binomial regression", "covered", ["test_binomial_golden.py"]),
        ("lognormal regression", "covered",
         ["test_more_likelihoods_golden.py"]),
        ("betabinomial regression", "covered",
         ["test_more_likelihoods_golden.py"]),
        ("linear covariance", "covered", ["test_linear_cov_golden.py"]),
        ("hurst covariance", "covered", ["test_cov_functions_golden.py"]),
        ("gamma_zero_inflated", "covered", ["test_censored_likelihoods.py"]),
        ("zoctn regression", "covered", ["test_censored_likelihoods.py"]),
        ("zero_one_censored_transformed_beta", "covered",
         ["test_censored_likelihoods.py"]),
        ("zero_one_censored_shifted_gamma", "covered",
         ["test_censored_likelihoods.py"]),
        ("iid model", "covered", ["test_iid_model.py"]),
    ],
    "test_GPModel_grouped_random_effects.R": [
        ("single level grouped", "covered", ["test_grouped_woodbury.py"]),
        ("linear mixed effects", "covered", ["test_grouped_woodbury.py"]),
        ("Multiple grouped", "covered", ["test_grouped_woodbury.py"]),
        ("Random coefficients with intercept random effect dropped",
         "covered", ["test_drop_intercept.py"]),
        ("cluster_id", "covered", ["test_clustered.py"]),
    ],
    "test_GPModel_combined_GP_random_effects.R": [
        ("Combined Gaussian process and grouped", "covered",
         ["test_combined_golden.py"]),
        ("linear regression term", "covered", ["test_combined_golden.py"]),
        ("random coefficients", "covered", ["test_combined_golden.py"]),
        ("cluster_id", "covered", ["test_combined_golden.py"]),
        ("Saving a GPModel", "covered", ["test_api_convenience.py"]),
    ],
    "test_z_GPBoost_algorithm.R": [
        ("grouped random effects model", "covered",
         ["test_gpboost_algorithm.py"]),
        ("reuse_learning_rates_gp_model", "covered",
         ["test_gpboost_reuse_lr.py"]),
        ("Gaussian process model", "covered", ["test_gpboost_algorithm.py"]),
        ("Vecchia approximation and Wendland", "covered",
         ["test_gpboost_algorithm.py"]),
        ("with fitc", "covered", ["test_gpboost_algorithm.py"]),
        ("with FSA", "covered", ["test_gpboost_algorithm.py"]),
        ("Nesterov", "covered", ["test_boosting_fixes.py"]),
        ("Saving and loading a booster", "covered",
         ["test_api_convenience.py"]),
    ],
    "test_z_GPBoost_algorithm_non_Gaussian_data.R": [
        ("grouped random effects model for binary", "covered",
         ["test_gpboost_algorithm.py"]),
        ("reuse_learning_rates_gp_model", "covered",
         ["test_gpboost_reuse_lr.py"]),
        ("only one grouping variable", "covered",
         ["test_gpboost_algorithm.py"]),
        ("Gaussian process model for binary", "covered",
         ["test_gpboost_algorithm.py", "test_device_loop_ng.py"]),
        ("multiple observations at the same location", "partial",
         ["test_duplicate_locations.py"]),
        ("combined Gaussian process and grouped", "partial",
         ["test_non_gaussian_combined.py"]),
        ("equivalence of Vecchia approximation", "covered",
         ["test_ng_matrix_golden.py"]),
        ("logit link", "covered", ["test_gpboost_algorithm.py"]),
        ("Poisson regression", "covered", ["test_gpboost_algorithm.py"]),
        ("gamma regression", "covered", ["test_gpboost_algorithm.py"]),
        ("negative binomial regression", "partial",
         ["test_more_likelihoods_golden.py"]),
        ("Saving and loading a booster", "covered",
         ["test_api_convenience.py"]),
        ("Parameter tuning", "covered", ["test_api_surface.py"]),
        ("gaussian_heteroscedastic", "covered", ["test_heteroscedastic.py",
                                                 "test_mean_scale.py"]),
    ],
    "test_basic.R": [
        ("early stopping", "covered", ["test_boosting_basic.py"]),
        ("first_metric_only", "covered", ["test_boosting_basic.py"]),
        ("linear learner", "covered", ["test_boosting_fixes.py"]),
        ("interaction_constraints", "covered",
         ["test_boosting_config_tail.py",
          "test_fast_grower_features.py"]),
        ("sparse features", "covered", ["test_pandas_sparse.py"]),
        ("eval", "covered", ["test_boosting_basic.py",
                             "test_ranking_tail.py"]),
        ("cv", "covered", ["test_boosting_basic.py"]),
        ("", "partial", ["test_boosting_basic.py"]),
    ],
    "test_gpb.Booster.R": [
        ("linear models at leaves", "covered", ["test_boosting_fixes.py"]),
        ("text file", "covered", ["test_model_text_interop.py"]),
        ("string", "covered", ["test_model_text_interop.py"]),
        ("rollback_one_iter", "covered", ["test_boosting_fixes.py"]),
        ("importance", "covered", ["test_boosting_fixes.py"]),
        (".rds", "covered", ["test_r_bindings.py"]),
        ("", "partial", ["test_boosting_basic.py", "test_r_bindings.py"]),
    ],
    "test_dataset.R": [
        ("", "covered", ["test_boosting_basic.py", "test_r_bindings.py"]),
    ],
    "test_Predictor.R": [
        ("start_iteration", "covered", ["test_pred_early_stop.py"]),
        ("", "partial", ["test_boosting_basic.py"]),
    ],
    "test_Grabit_mean-scale_regression.R": [
        ("", "covered", ["test_mean_scale.py"]),
    ],
    "test_parameters.R": [
        ("Feature penalties", "covered", ["test_boosting_config_tail.py"]),
    ],
    "test_gpb.interprete.R": [("", "covered", ["test_r_bindings.py"])],
    "test_gpb.plot.importance.R": [("", "covered", ["test_r_bindings.py"])],
    "test_gpb.plot.interpretation.R": [("", "covered",
                                        ["test_r_bindings.py"])],
    "test_gpb.importance.R": [("", "covered", ["test_r_bindings.py"])],
    "test_gpb.convert_with_rules.R": [("", "covered",
                                       ["test_r_bindings.py"])],
}


def extract_blocks(path):
    lines = open(path, encoding="utf-8", errors="replace").read().splitlines()
    blocks, cur = [], None
    for i, ln in enumerate(lines, 1):
        m = re.search(r'test_that\("([^"]+)"', ln)
        if m:
            if cur:
                blocks.append(cur)
            cur = {"name": m.group(1).strip(), "line": i, "assertions": 0}
        if re.search(r'expect_(lt|gt|equal|error|true|false|near)\(', ln):
            if cur:
                cur["assertions"] += 1
    if cur:
        blocks.append(cur)
    return blocks


def classify(fname, block_name):
    for sub, status, mods in RULES.get(fname, []):
        if sub.strip().lower() in block_name.strip().lower():
            return status, mods
    return "uncovered", []


def main():
    out = {}
    for fn in sorted(os.listdir(BASE)):
        if not fn.endswith(".R"):
            continue
        blocks = extract_blocks(os.path.join(BASE, fn))
        for b in blocks:
            b["status"], b["repo_tests"] = classify(fn, b["name"])
        out[fn] = {
            "total_assertions": sum(b["assertions"] for b in blocks),
            "blocks": blocks,
        }
    tot = sum(v["total_assertions"] for v in out.values())
    cov = sum(b["assertions"] for v in out.values() for b in v["blocks"]
              if b["status"] in ("covered", "partial"))
    out["_summary"] = {
        "total_assertions": tot,
        "covered_or_partial_assertions": cov,
        "ratio": round(cov / tot, 4),
        "uncovered_blocks": [
            (f, b["name"]) for f, v in out.items() if not f.startswith("_")
            for b in v["blocks"] if b["status"] == "uncovered"],
    }
    with open(os.path.abspath(OUT), "w") as f:
        json.dump(out, f, indent=1)
    print("total", tot, "covered-or-partial", cov,
          "ratio", round(cov / tot, 4))
    for f_, n in out["_summary"]["uncovered_blocks"]:
        print("UNCOVERED:", f_, "::", n)


if __name__ == "__main__":
    main()
