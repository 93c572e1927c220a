"""Multi-host training path: 2-process ``jax.distributed`` on CPU.

Proves the BASELINE multi-node story (SURVEY.md §2 parallelism table): env
batch sharded over a GLOBAL mesh spanning process boundaries, learner
replicated, gradient all-reduce crossing processes — and the updates are
identical to the single-process run of the same global program.
"""

import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

WORKER = r"""
import os, sys
pid, n, port, out, agent = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                            sys.argv[4], sys.argv[5])
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={8 // n}"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if n > 1:
    jax.distributed.initialize(f"localhost:{port}", num_processes=n, process_id=pid)
import numpy as np
from deeprl_signal_control_tpu.config import EnvConfig, ModelConfig
from deeprl_signal_control_tpu.models.algorithms import make_algorithm
from deeprl_signal_control_tpu.parallel.mesh import make_mesh
from deeprl_signal_control_tpu.runner import Trainer
from deeprl_signal_control_tpu.sim.env import TrafficEnv
from deeprl_signal_control_tpu.utils.experiment import Counter

assert jax.device_count() == 8
env = TrafficEnv(EnvConfig(scenario="small_grid", agent=agent,
                           episode_length_sec=60))
mc = ModelConfig(batch_size=6, num_fw=16, num_ft=4, num_lstm=8,
                 num_fc=16, num_h=8, buffer_size=64)
alg = make_algorithm(agent, env, 1000, mc, seed=0)
counter = Counter(total_step=96, test_step=1000, log_step=1000)
workdir = os.path.join(out + f".work{pid}", "")
os.makedirs(workdir, exist_ok=True)
trainer = Trainer(env, alg, counter, workdir, num_envs=8, mesh=make_mesh())
ts = trainer.run(alg.init_train_state())
checks = [float(np.abs(np.asarray(x)).sum()) for x in jax.tree.leaves(ts.params)]
with open(out + f".{pid}", "w") as f:
    f.write(",".join(f"{c!r}" for c in checks))
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _read(path):
    with open(path) as f:
        return np.array([float(x) for x in f.read().split(",")])


@pytest.mark.parametrize("agent", ["ia2c", "iqll"])
def test_two_process_distributed_matches_single_process(tmp_path, agent):
    """ia2c exercises the A2C chunk; iqll the IQL chunk with its env-sharded
    replay buffer state crossing the 2-process mesh."""
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + os.environ.get("PYTHONPATH", ""))
    env.pop("JAX_PLATFORMS", None)

    # single-process reference run (8 local devices)
    out1 = str(tmp_path / "single")
    subprocess.run([sys.executable, str(script), "0", "1", "0", out1, agent],
                   check=True, env=env, timeout=300)

    # two processes x 4 devices = the same 8-device global mesh
    out2 = str(tmp_path / "multi")
    port = str(_free_port())
    procs = [subprocess.Popen([sys.executable, str(script), str(i), "2",
                               port, out2, agent], env=env) for i in range(2)]
    for p in procs:
        assert p.wait(timeout=300) == 0

    single = _read(out1 + ".0")
    p0, p1 = _read(out2 + ".0"), _read(out2 + ".1")
    # both processes hold the same replicated parameters...
    np.testing.assert_array_equal(p0, p1)
    # ...and the cross-process SPMD program computes the same updates as
    # the single-process one
    np.testing.assert_allclose(p0, single, rtol=1e-6)
