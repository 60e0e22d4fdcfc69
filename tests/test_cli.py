"""CLI / config round-trip tests (VERDICT r3 item 8).

Every ``configs/*.json`` is driven through the real argparse + load_config
path of ``cli.py`` / ``eval_cli.py`` down to the ``bo()`` /
``evaluate_candidates()`` call boundary (monkeypatched), pinning the config
schema against the reference's bo_configs/test_configs field set
(ref bayesian_optimization.py:3895-3909 parses the same JSON via
``pd.read_json``; eval_result.py:61-85 is the fixed-candidate path).
"""

import glob
import json
import os

import pytest

import mfvi_dip_mia_tpu.cli as cli_mod
import mfvi_dip_mia_tpu.eval_cli as eval_cli_mod

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
BO_CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "bo_*.json")))
TEST_CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "test_*.json")))

# Canonical run_params field set of the reference's configs
# (e.g. bo_configs/bo_mfvi_ct.json, test_configs/mfvi_den.json).
REF_RUN_FIELDS = {"img", "num_iter", "lr", "seed", "p_sigma", "input_depth",
                  "show_every", "plot", "save", "devices", "save_path",
                  "bo_results_path"}
# 2 BO axes per method (ref bayesian_optimization.py:3715-3718); the dip
# test configs reuse the mfvi axes (unused by the runner, ref :1070-1071).
METHOD_PARAMS = {"mfvi": {"temp", "sigma"},
                 "dip": {"temp", "sigma"},
                 "mcd": {"dropout_p", "weight_decay"},
                 "sgld": {"gamma", "weight_decay"}}
TASK_FROM_SUFFIX = {"den": "denoising", "ct": "ct", "sr": "super-resolution",
                    "inp": "inpainting"}


def _parse_name(path):
    """configs/{bo|test}_{method}[_{task}].json -> (method, cli task name)."""
    stem = os.path.splitext(os.path.basename(path))[0]
    parts = stem.split("_")
    method = parts[1]
    task = TASK_FROM_SUFFIX[parts[2]] if len(parts) > 2 else "denoising"
    return method, task


def test_all_31_configs_present():
    # 15 bo (3 methods x 4 tasks + 3 default-den files) + 16 test configs,
    # matching the reference's bo_configs/ + test_configs/ counts.
    assert len(BO_CONFIGS) == 15
    assert len(TEST_CONFIGS) == 16


@pytest.mark.parametrize("path", BO_CONFIGS, ids=os.path.basename)
def test_bo_config_roundtrip(path, monkeypatch):
    raw = json.load(open(path))
    method, task = _parse_name(path)
    captured = {}

    def fake_bo(**kwargs):
        captured.update(kwargs)

    monkeypatch.setattr(cli_mod, "bo", fake_bo)
    cli_mod.main(["--task", task, "--bayes", method, "--config", path,
                  "--num-iter", "7", "--rounds", "3", "--no-plot"])

    assert captured["task"] == task
    assert captured["bayes"] == method
    assert captured["n_rounds"] == 3
    assert captured["plot"] is False
    assert captured["resume"] is False
    # bo_params survive the load_config dataclass round-trip verbatim
    assert set(captured["bo_params"]) == METHOD_PARAMS[method]
    for name, spec in raw["bo_params"].items():
        assert captured["bo_params"][name]["logbounds"] == spec["logbounds"]
        assert captured["bo_params"][name]["candidates"] == spec["candidates"]
    # run_params fields pass through except the --num-iter override
    rp = captured["run_params"]
    assert rp["num_iter"] == 7
    for key, val in raw["run_params"].items():
        if key != "num_iter":
            assert rp[key] == val, key


@pytest.mark.parametrize("path", TEST_CONFIGS, ids=os.path.basename)
def test_eval_config_roundtrip(path, monkeypatch):
    raw = json.load(open(path))
    method, task = _parse_name(path)
    captured = {}

    def fake_eval(task, bayes, bo_params, run_params):
        captured.update(task=task, bayes=bayes, bo_params=bo_params,
                        run_params=run_params)

    monkeypatch.setattr(eval_cli_mod, "evaluate_candidates", fake_eval)
    eval_cli_mod.main(["--task", task, "--bayes", method, "--config", path,
                       "--num-iter", "5", "--no-save"])

    assert captured["task"] == task and captured["bayes"] == method
    assert set(captured["bo_params"]) == METHOD_PARAMS[method]
    for name, spec in raw["bo_params"].items():
        assert captured["bo_params"][name]["candidates"] == spec["candidates"]
    rp = captured["run_params"]
    assert rp["num_iter"] == 5
    assert rp["save"] is False and rp["plot"] is False  # --no-save semantics


@pytest.mark.parametrize("path", BO_CONFIGS + TEST_CONFIGS,
                         ids=os.path.basename)
def test_config_schema_pins_reference_fields(path):
    raw = json.load(open(path))
    method, _ = _parse_name(path)
    assert set(raw["run_params"]) == REF_RUN_FIELDS
    assert set(raw["bo_params"]) == METHOD_PARAMS[method]
    for spec in raw["bo_params"].values():
        lo, hi = spec["logbounds"]
        assert lo < hi
        assert len(spec["candidates"]) >= 1
