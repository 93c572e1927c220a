"""Experiment configuration.

INI-compatible with the reference config system (three sections
``MODEL_CONFIG`` / ``TRAIN_CONFIG`` / ``ENV_CONFIG``; key set per
/root/reference/config/config_ma2c_large.ini and friends, consumed at
/root/reference/main.py:88-100, /root/reference/agents/models.py,
/root/reference/envs/env.py:84-104).

Extra TPU-native keys live in ``TRAIN_CONFIG`` and default sensibly when
absent so reference INI files load unchanged:

* ``num_envs``        — parallel env instances per host (default 1).
* ``checkpoint_interval`` — steps between Orbax checkpoints (default 0 = only final).

Step accounting with batched envs (num_envs = B > 1)
----------------------------------------------------
``total_step``, ``test_interval`` and ``log_interval`` count **global
env-steps summed over the batch**: every jitted chunk advances the counter
by ``batch_size * B``. Consequences, all deliberate:

* lr/epsilon/entropy schedules are pure functions of the global step
  (ops/schedules.py) and therefore decay over the *whole* run independent
  of B — exactly like the reference's per-step scheduler over its 1e6-step
  budget (/root/reference/agents/models.py:53-69).
* Per-env experience is ``total_step / B`` steps, and the number of
  gradient updates is ``total_step / (batch_size * B)``; each update
  averages B times more transitions than the reference's. When raising B,
  raise ``total_step`` so the update count stays in the converging regime
  (the shipped b1k preset keeps ~1.2k updates, matching what the 64-env
  run needed).
* In-training tests fire every ``test_interval`` global steps, i.e. fewer
  times per env-lifetime at large B — cadence is in wall-clock-ish units
  (data consumed), not per-env progress.
"""

from __future__ import annotations

import configparser
import dataclasses
import os
from typing import Optional


_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def preset_path(name: str) -> str:
    """Path to a shipped preset, e.g. ``preset_path('ma2c_large')``."""
    fname = name if name.endswith(".ini") else f"config_{name}.ini"
    return os.path.join(_CONFIG_DIR, fname)


def load_ini(path: str) -> configparser.ConfigParser:
    cp = configparser.ConfigParser()
    read = cp.read(path)
    if not read:
        raise FileNotFoundError(f"config file not found: {path}")
    return cp


@dataclasses.dataclass
class EnvConfig:
    """ENV_CONFIG section (keys per /root/reference/envs/env.py:84-104)."""

    scenario: str = "large_grid"
    agent: str = "ma2c"
    seed: int = 12
    control_interval_sec: int = 5
    yellow_interval_sec: int = 2
    episode_length_sec: int = 3600
    objective: str = "hybrid"  # queue | wait | hybrid
    coop_gamma: float = 0.9
    data_path: str = ""
    norm_wave: float = 5.0
    norm_wait: float = 100.0
    clip_wave: float = 2.0
    clip_wait: float = 2.0
    coef_wait: float = 0.2
    test_seeds: tuple = (10000, 20000)
    # scenario-specific traffic knobs
    peak_flow1: int = 1100  # large_grid (env ref large_grid_env.py:65)
    peak_flow2: int = 925
    init_density: float = 0.0
    num_extra_car_per_hour: int = 1000  # small_grid (small_grid_env.py:60)
    flow_rate: int = 325  # real_net (real_net_env.py:116)
    # real_net demand profile: "current" = what build_file.py generates
    # today; "legacy" = the older commented-out demand the reference's
    # shipped eva_data CSVs were produced with (see real_net_impl.LEGACY_*)
    demand: str = "current"
    # per-vehicle trip ring capacity for evaluation recording;
    # 0 (default) = derive from scenario demand at env build (see
    # TrafficEnv.__init__), a positive value overrides
    trip_cap: int = 0

    @classmethod
    def from_ini(cls, section) -> "EnvConfig":
        kw = {}
        for f in dataclasses.fields(cls):
            if f.name not in section:
                continue
            raw = section.get(f.name)
            if f.name == "test_seeds":
                kw[f.name] = tuple(int(s) for s in raw.split(","))
            elif f.type in ("int", int):
                kw[f.name] = int(float(raw))
            elif f.type in ("float", float):
                kw[f.name] = float(raw)
            else:
                kw[f.name] = raw
        return cls(**kw)


@dataclasses.dataclass
class ModelConfig:
    """MODEL_CONFIG section (keys per reference config presets)."""

    # A2C family (agents/models.py:53-81)
    rmsp_alpha: float = 0.99
    rmsp_epsilon: float = 1e-5
    max_grad_norm: float = 40.0
    gamma: float = 0.99
    lr_init: float = 5e-4
    lr_decay: str = "constant"
    lr_min: float = 0.0
    entropy_coef_init: float = 0.01
    entropy_coef_min: float = 0.01
    entropy_decay: str = "constant"
    entropy_ratio: float = 0.5
    value_coef: float = 0.5
    num_fw: int = 128
    num_ft: int = 32
    num_lstm: int = 64
    num_fp: int = 64
    batch_size: int = 120
    reward_norm: float = 2000.0
    reward_clip: float = 2.0
    # IQL family (agents/models.py:305-331)
    epsilon_init: float = 1.0
    epsilon_min: float = 0.01
    epsilon_decay: str = "linear"
    epsilon_ratio: float = 0.5
    buffer_size: int = 1000
    num_h: int = 64
    num_fc: int = 128
    # TPU-native extension: replay minibatch sampling discipline. The
    # reference's random.sample is without replacement (agents/utils.py:253);
    # 'with' (default) keeps the round-1 with-replacement approximation,
    # 'without' matches the reference exactly (IQL divergence experiment).
    replay_sampling: str = "with"

    # TPU-native extension: A2C-family actor architecture, 'lstm' (reference
    # LstmACPolicy default) or 'fc' (reference FcACPolicy variants)
    actor_type: str = "lstm"

    @classmethod
    def from_ini(cls, section) -> "ModelConfig":
        kw = {}
        for f in dataclasses.fields(cls):
            if f.name not in section:
                continue
            raw = section.get(f.name)
            if f.type in ("int", int):
                kw[f.name] = int(float(raw))
            elif f.type in ("float", float):
                kw[f.name] = float(raw)
            else:
                kw[f.name] = raw
        return cls(**kw)


@dataclasses.dataclass
class TrainConfig:
    """TRAIN_CONFIG section (read at /root/reference/main.py:98-100)."""

    total_step: int = 1_000_000
    test_interval: int = 20_000
    log_interval: int = 10_000
    # TPU-native extensions
    num_envs: int = 1
    checkpoint_interval: int = 0

    @classmethod
    def from_ini(cls, section) -> "TrainConfig":
        kw = {}
        for f in dataclasses.fields(cls):
            if f.name in section:
                kw[f.name] = int(float(section.get(f.name)))
        return cls(**kw)


@dataclasses.dataclass
class ExperimentConfig:
    env: EnvConfig
    model: ModelConfig
    train: TrainConfig
    source_path: Optional[str] = None

    @classmethod
    def from_file(cls, path: str) -> "ExperimentConfig":
        cp = load_ini(path)
        env = EnvConfig.from_ini(cp["ENV_CONFIG"]) if "ENV_CONFIG" in cp else EnvConfig()
        model = ModelConfig.from_ini(cp["MODEL_CONFIG"]) if "MODEL_CONFIG" in cp else ModelConfig()
        train = TrainConfig.from_ini(cp["TRAIN_CONFIG"]) if "TRAIN_CONFIG" in cp else TrainConfig()
        return cls(env=env, model=model, train=train, source_path=path)

    @classmethod
    def from_preset(cls, name: str) -> "ExperimentConfig":
        return cls.from_file(preset_path(name))
