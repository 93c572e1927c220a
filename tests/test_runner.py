"""End-to-end runner tests: train -> checkpoint -> resume -> evaluate on a
shortened small_grid episode."""

import os

import numpy as np
import pytest

from deeprl_signal_control_tpu.config import EnvConfig, ModelConfig
from deeprl_signal_control_tpu.models.algorithms import make_algorithm
from deeprl_signal_control_tpu.runner import (
    Checkpointer,
    Evaluator,
    GreedyEvaluator,
    Trainer,
)
from deeprl_signal_control_tpu.sim.env import TrafficEnv
from deeprl_signal_control_tpu.utils.experiment import Counter


def short_env(agent, **kw):
    return TrafficEnv(EnvConfig(
        scenario="small_grid", agent=agent, episode_length_sec=300,
        test_seeds=(10000, 20000), **kw,
    ))


@pytest.mark.parametrize("agent", ["ia2c", "ma2c", "iqll", "iqld",
                                   "iqll-noreplace"])
def test_train_loop_runs(agent, tmp_path):
    # iqll-noreplace exercises the reference-exact without-replacement
    # minibatch draw (ops/replay.py:replay_sample_noreplace)
    sampling = "without" if agent.endswith("-noreplace") else "with"
    agent = agent.split("-")[0]
    env = short_env(agent)
    mc = ModelConfig(batch_size=20, num_fw=16, num_ft=4, num_fp=4, num_lstm=8,
                     num_fc=16, num_h=8, buffer_size=100, reward_norm=50.0,
                     replay_sampling=sampling)
    alg = make_algorithm(agent, env, 1000, mc, seed=0)
    counter = Counter(total_step=2 * 60 * 2, test_step=10**9, log_step=100)
    trainer = Trainer(env, alg, counter, str(tmp_path) + os.sep, num_envs=2)
    ts = alg.init_train_state()
    ts = trainer.run(ts)
    assert counter.cur_step >= counter.total_step
    df_path = tmp_path / "train_reward.csv"
    assert df_path.exists()
    import pandas as pd

    df = pd.read_csv(df_path)
    assert len(df) == 2  # two episodes
    assert (df["test_id"] == -1).all()
    assert np.isfinite(df["avg_reward"]).all()


def test_checkpoint_save_resume(tmp_path):
    env = short_env("ia2c")
    mc = ModelConfig(batch_size=20, num_fw=16, num_ft=4, num_lstm=8)
    alg = make_algorithm("ia2c", env, 1000, mc, seed=0)
    ts = alg.init_train_state()
    counter = Counter(100, 10**9, 100)
    counter.next(42)
    ck = Checkpointer(str(tmp_path / "model"), max_to_keep=2)
    ck.save(42, ts, counter, episode=3)
    ck.save(84, ts, counter, episode=6)
    ck.save(126, ts, counter, episode=9)
    # keeps newest 2
    assert ck._steps() == [84, 126]
    ts2 = alg.init_train_state()
    restored = ck.load(ts2)
    assert restored is not None
    ts3, counter_state, episode = restored
    assert episode == 9
    import jax

    for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(ts3.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_greedy_evaluator_writes_csvs(tmp_path):
    env = short_env("greedy", norm_wave=1.0, norm_wait=1.0,
                    clip_wave=1000.0, clip_wait=1000.0)
    out = GreedyEvaluator(env, str(tmp_path)).run([10000, 20000])
    assert np.isfinite(out["avg_reward"])
    for suffix in ("traffic", "trip", "control"):
        assert (tmp_path / f"small_grid_greedy_{suffix}.csv").exists()
    import pandas as pd

    traffic = pd.read_csv(tmp_path / "small_grid_greedy_traffic.csv")
    assert traffic["number_total_car"].max() > 0
    assert traffic["time_sec"].max() == 300
    # per-vehicle trip rows (ref tripinfo schema, env.py:498-515)
    trip = pd.read_csv(tmp_path / "small_grid_greedy_trip.csv")
    assert len(trip) == int(np.asarray(out["env_state"].n_arrived).sum())
    assert (trip["duration_sec"] > 0).all()
    assert np.allclose(
        trip["arrival_sec"], trip["depart_sec"] + trip["duration_sec"]
    )
    assert np.isclose(
        trip[trip.episode == 0]["wait_sec"].sum(),
        float(out["env_state"].trip_wait_sum[0]), rtol=1e-4,
    )
    # per-control-step rows with joint actions (ref env.py:580-588)
    ctrl = pd.read_csv(tmp_path / "small_grid_greedy_control.csv")
    assert len(ctrl) == 2 * env.T
    assert set(ctrl["step"]) == set(range(1, env.T + 1))
    assert all(len(a.split(",")) == env.n_node for a in ctrl["action"])


def test_in_train_test_rows(tmp_path):
    env = short_env("ia2c")
    mc = ModelConfig(batch_size=20, num_fw=16, num_ft=4, num_lstm=8)
    alg = make_algorithm("ia2c", env, 1000, mc, seed=0)
    counter = Counter(total_step=2 * 60, test_step=60, log_step=100)
    trainer = Trainer(env, alg, counter, str(tmp_path) + os.sep, num_envs=1,
                      run_test=True)
    ts = alg.init_train_state()
    trainer.run(ts)
    import pandas as pd

    df = pd.read_csv(tmp_path / "train_reward.csv")
    assert (df["test_id"] >= 0).any(), df


def test_realign_after_resume_reloads_and_degrades(tmp_path):
    """realign_after_resume reloads BOTH train_reward.csv and train_log.csv
    filtered to the restored step, and degrades to empty history (instead of
    raising) on empty/legacy files (ADVICE r3 items 2-3)."""
    import types

    import pandas as pd

    stub = types.SimpleNamespace(
        counter=types.SimpleNamespace(cur_step=100),
        checkpoint_interval=50,
        output_path=str(tmp_path),
        data=None,
        log_data=None,
    )
    pd.DataFrame(dict(step=[50, 100, 150], avg_reward=[1.0, 2.0, 3.0])).to_csv(
        tmp_path / "train_reward.csv")
    pd.DataFrame(dict(step=[60, 120], loss=[0.5, 0.4])).to_csv(
        tmp_path / "train_log.csv")
    Trainer.realign_after_resume(stub)
    assert [r["step"] for r in stub.data] == [50, 100]
    assert [r["step"] for r in stub.log_data] == [60]
    assert stub._next_ckpt == 150

    # empty file + legacy file without a 'step' column: degrade, don't raise
    (tmp_path / "train_reward.csv").write_text("")
    pd.DataFrame(dict(reward=[1.0])).to_csv(tmp_path / "train_log.csv")
    Trainer.realign_after_resume(stub)
    assert stub.data == [] and stub.log_data == []
