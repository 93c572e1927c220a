"""CLI experiment driver.

Mirrors the reference's entry surface (/root/reference/main.py:21-48):

    python3 main.py --base-dir <dir> train --config-dir <ini> --test-mode <m>
    python3 main.py --base-dir <dir> evaluate --agents a,b \
        --evaluation-seeds 10000,20000 [--evaluation-policy-type T] [--demo]

Run-dir contract (utils.init_dir, main.py:84-87, 164): training writes
{log,data,model}; the config INI is copied into data/ and rediscovered from
there during evaluation; evaluation writes {eva_data,eva_log}.

``--demo`` (SUMO GUI in the reference) is accepted and ignored — there is no
external simulator window to show.
"""

from __future__ import annotations

import argparse
import configparser
import logging
import os

import jax


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base-dir", type=str, required=True,
                        help="experiment base dir")
    sp = parser.add_subparsers(dest="option", help="train or evaluate")
    p = sp.add_parser("train", help="train a single agent under base dir")
    p.add_argument("--test-mode", type=str, default="no_test",
                   choices=["no_test", "in_train_test", "after_train_test",
                            "all_test"])
    p.add_argument("--config-dir", type=str, required=True,
                   help="experiment config path")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint (new capability)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of training into "
                        "<base-dir>/log/profile (view with tensorboard/xprof)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed for multi-host meshes "
                        "(coordinator/process env vars per JAX docs)")
    p = sp.add_parser("evaluate", help="evaluate and compare agents under base dir")
    p.add_argument("--agents", type=str, default="naive",
                   help="agent folder names for evaluation, split by ,")
    p.add_argument("--evaluation-policy-type", type=str, default="default",
                   help="default, stochastic, or deterministic")
    p.add_argument("--evaluation-seeds", type=str,
                   default=",".join(str(i) for i in range(10000, 100001, 10000)))
    p.add_argument("--demo", action="store_true")
    args = parser.parse_args()
    if not args.option:
        parser.print_help()
        raise SystemExit(1)
    return args


def train(args):
    from deeprl_signal_control_tpu.config import ExperimentConfig
    from deeprl_signal_control_tpu.models.algorithms import make_algorithm
    from deeprl_signal_control_tpu.runner import Checkpointer, Trainer
    from deeprl_signal_control_tpu.sim import make_env
    from deeprl_signal_control_tpu.utils.experiment import (
        Counter, copy_file, init_dir, init_log, init_test_flag,
    )

    if args.multihost:
        # cluster-env autodetection (GCE TPU metadata) or the
        # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID vars
        jax.distributed.initialize()

    is_main = jax.process_index() == 0
    dirs = init_dir(args.base_dir)
    init_log(dirs["log"], file_output=is_main)
    if is_main:
        copy_file(args.config_dir, dirs["data"])
    cfg = ExperimentConfig.from_file(args.config_dir)
    in_test, post_test = init_test_flag(args.test_mode)

    env = make_env(cfg.env)
    logging.info(
        "Training: s dim ls: %r, a dim ls: %r", env.n_s_ls, env.n_a_ls,
    )
    counter = Counter(cfg.train.total_step, cfg.train.test_interval,
                      cfg.train.log_interval)
    if env.agent == "greedy":
        raise SystemExit("greedy has no trainable model; use evaluate")
    alg = make_algorithm(env.agent, env, cfg.train.total_step, cfg.model,
                         seed=cfg.env.seed)
    train_state = alg.init_train_state()
    ckpt = Checkpointer(dirs["model"])
    mesh = None
    if jax.device_count() > 1 and cfg.train.num_envs % jax.device_count() == 0:
        from deeprl_signal_control_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        logging.info("Sharding %d envs over a %d-device mesh",
                     cfg.train.num_envs, jax.device_count())
    trainer = Trainer(env, alg, counter, dirs["data"],
                      num_envs=cfg.train.num_envs, run_test=in_test,
                      seed=cfg.env.seed, mesh=mesh, checkpointer=ckpt,
                      checkpoint_interval=cfg.train.checkpoint_interval)
    if args.resume:
        restored = ckpt.load(train_state)
        if restored:
            train_state, counter_state, episode = restored
            counter.load_state_dict(counter_state)
            trainer.episode = episode
            trainer.realign_after_resume()
    if args.profile:
        with jax.profiler.trace(os.path.join(dirs["log"], "profile")):
            train_state = trainer.run(train_state)
    else:
        train_state = trainer.run(train_state)

    if post_test:
        if not hasattr(env, "spec"):
            logging.warning("post-train evaluation skipped: debug scenario "
                            "has no traffic metrics")
        else:
            from deeprl_signal_control_tpu.runner import Evaluator

            ev = Evaluator(env, alg, train_state, dirs["data"])
            ev.run(cfg.env.test_seeds)

    final_step = counter.cur_step
    logging.info("Training: save final model at step %d ...", final_step)
    ckpt.save(final_step, train_state, counter, trainer.episode)


def evaluate_agent(agent, base_dir, output_dir, seeds, policy_type):
    from deeprl_signal_control_tpu.config import ExperimentConfig
    from deeprl_signal_control_tpu.models.algorithms import make_algorithm
    from deeprl_signal_control_tpu.runner import Checkpointer, Evaluator
    from deeprl_signal_control_tpu.sim.env import TrafficEnv
    from deeprl_signal_control_tpu.utils.experiment import check_dir, find_file

    agent_dir = os.path.join(base_dir, agent)
    if agent != "greedy" and not check_dir(agent_dir):
        logging.error("Evaluation: %s does not exist!", agent)
        return
    if agent == "greedy":
        config_dir = find_file(os.path.join(base_dir, "greedy", "data")) if (
            check_dir(os.path.join(base_dir, "greedy", "data"))
        ) else None
        if config_dir is None:
            # fall back to any sibling agent's config
            for other in sorted(os.listdir(base_dir)):
                d = os.path.join(base_dir, other, "data")
                if check_dir(d) and find_file(d):
                    config_dir = find_file(d)
                    break
    else:
        config_dir = find_file(os.path.join(agent_dir, "data"))
    if not config_dir:
        return
    cfg = ExperimentConfig.from_file(config_dir)
    cfg.env.agent = agent
    env = TrafficEnv(cfg.env)
    logging.info(
        "Evaluation: agent %s, s dim: %d, a dim %d", agent, env.n_s, env.n_a
    )
    if agent == "greedy":
        from deeprl_signal_control_tpu.runner import GreedyEvaluator

        GreedyEvaluator(env, output_dir).run(seeds)
        return
    alg = make_algorithm(agent, env, 0, cfg.model, seed=0)
    train_state = alg.init_train_state()
    restored = Checkpointer(os.path.join(agent_dir, "model")).load(train_state)
    if not restored:
        return
    train_state = restored[0]
    Evaluator(env, alg, train_state, output_dir, policy_type=policy_type).run(seeds)


def evaluate(args):
    from deeprl_signal_control_tpu.utils.experiment import init_dir, init_log

    dirs = init_dir(args.base_dir, pathes=["eva_data", "eva_log"])
    init_log(dirs["eva_log"])
    agents = args.agents.split(",")
    seeds = [int(s) for s in args.evaluation_seeds.split(",")] if (
        args.evaluation_seeds
    ) else []
    logging.info("Evaluation: policy type: %s, seeds: %r",
                 args.evaluation_policy_type, seeds)
    for agent in agents:
        evaluate_agent(agent, args.base_dir, dirs["eva_data"], seeds,
                       args.evaluation_policy_type)


if __name__ == "__main__":
    args = parse_args()
    if args.option == "train":
        train(args)
    else:
        evaluate(args)
