"""Hyperparameter optimization harness.

Replaces the reference's Optuna study (recipes/dcase2024_task4_baseline/
optuna_pretrained.py:70-213). Optuna is used when importable; otherwise a
seeded random-search fallback samples the same spaces. The two reference
search modes are reproduced:

  "train": gradient_clip / lr / dropout / dropstep / RNN size / layers /
           warmup (optuna_pretrained.py:70-96)
  "eval":  per-class median-filter window lengths 1..20 step 2
           (optuna_pretrained.py:99-109)

Results are appended to a jsonl study log so interrupted studies resume.
"""

from __future__ import annotations

import copy
import json
import random
from pathlib import Path
from typing import Callable


def sample_params_train(config: dict, suggest) -> dict:
    config = copy.deepcopy(config)
    config["training"]["gradient_clip"] = suggest.categorical(
        "gradient_clip", [0.0, 1.0, 5.0, 0.5]
    )
    config["opt"]["lr"] = suggest.float("lr", 0.0001, 0.005, step=0.0005)
    config["net"]["dropout"] = suggest.float("dropout", 0.1, 0.5, step=0.1)
    config["net"]["dropstep_recurrent"] = suggest.float(
        "dropout_recurrent", 0.0, 0.5, step=0.1
    )
    config["net"]["dropstep_recurrent_len"] = suggest.int(
        "dropstep_recurrent_len", 1, 20, step=3
    )
    config["net"]["n_RNN_cell"] = suggest.categorical("n_RNN_cell", [128, 192, 256])
    config["net"]["rnn_layers"] = suggest.categorical("rnn_layers", [1, 2])
    config["training"]["n_epochs_warmup"] = suggest.categorical(
        "n_epochs_warmup", [50, 100]
    )
    return config


def sample_params_eval(config: dict, suggest) -> dict:
    config = copy.deepcopy(config)
    n = len(config["net"]["median_filter"])
    config["net"]["median_filter"] = [
        suggest.int(f"median_filt_cls_{i}", 1, 20, step=2) for i in range(n)
    ]
    return config


class _RandomSuggest:
    """Random sampler with the optuna.Trial suggest API shape."""

    def __init__(self, rng: random.Random):
        self.rng = rng
        self.params: dict = {}

    def categorical(self, name, choices):
        v = self.rng.choice(choices)
        self.params[name] = v
        return v

    def float(self, name, low, high, step=None):
        if step:
            n = int(round((high - low) / step))
            v = low + self.rng.randint(0, n) * step
        else:
            v = self.rng.uniform(low, high)
        self.params[name] = v
        return v

    def int(self, name, low, high, step=1):
        v = self.rng.randrange(low, high + 1, step)
        self.params[name] = v
        return v


class _OptunaSuggest:
    def __init__(self, trial):
        self.trial = trial
        self.params = {}

    def categorical(self, name, choices):
        v = self.trial.suggest_categorical(name, choices)
        self.params[name] = v
        return v

    def float(self, name, low, high, step=None):
        v = self.trial.suggest_float(name, low, high, step=step)
        self.params[name] = v
        return v

    def int(self, name, low, high, step=1):
        v = self.trial.suggest_int(name, low, high, step=step)
        self.params[name] = v
        return v


def run_study(
    config: dict,
    objective_fn: Callable[[dict], float],
    n_trials: int,
    log_dir: str,
    mode: str = "train",
    seed: int = 42,
) -> dict:
    """Maximize objective_fn(config). Returns the best trial record."""
    sampler_fn = sample_params_train if mode == "train" else sample_params_eval
    log_path = Path(log_dir)
    log_path.mkdir(parents=True, exist_ok=True)
    study_log = log_path / f"study_{mode}.jsonl"
    done = []
    if study_log.exists():
        done = [json.loads(l) for l in study_log.read_text().splitlines() if l]

    try:
        import optuna  # noqa

        have_optuna = True
    except ImportError:
        have_optuna = False

    records = list(done)

    def run_one(suggest) -> float:
        trial_config = sampler_fn(config, suggest)
        value = float(objective_fn(trial_config))
        rec = {"params": suggest.params, "value": value}
        records.append(rec)
        with open(study_log, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return value

    if have_optuna:
        import optuna

        study = optuna.create_study(
            direction="maximize",
            storage=f"sqlite:///{log_path}/optuna-sed.db",
            study_name=f"sed-{mode}",
            load_if_exists=True,
        )
        study.optimize(
            lambda t: run_one(_OptunaSuggest(t)),
            n_trials=max(0, n_trials - len(done)),
        )
    else:
        rng = random.Random(seed + len(done))
        for _ in range(max(0, n_trials - len(done))):
            run_one(_RandomSuggest(rng))

    best = max(records, key=lambda r: r["value"]) if records else None
    if best:
        (log_path / f"best_{mode}.json").write_text(json.dumps(best, indent=2))
    return best
