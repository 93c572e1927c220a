"""deeprl_signal_control_tpu — TPU-native multi-agent deep-RL traffic signal control.

A from-scratch JAX/XLA/pjit framework with the capabilities of the reference
cts198859/deeprl_signal_control (TF1 + SUMO/TraCI), re-designed TPU-first:

* The traffic microsimulator is a pure, jittable JAX function over a compiled
  static network description (``scenarios.spec.NetworkSpec``) — no external
  simulator process, no TCP round-trips (replaces /root/reference/envs/env.py
  TraCI stepping, env.py:461-471).
* Thousands of environment instances run in lockstep via ``jax.vmap`` and are
  sharded over a device mesh with ``shard_map`` (replaces the reference's
  single serial SUMO instance).
* The multi-agent learner stacks per-intersection parameters on a leading
  agent axis and performs one vmapped update for all agents (replaces the
  per-agent ``sess.run`` python loop, /root/reference/agents/models.py:174-200).

Subpackages
-----------
``config``      INI-compatible experiment configuration (same keys as reference).
``scenarios``   Scenario compilers: small_grid, large_grid, real_net -> NetworkSpec.
``sim``         The vectorized traffic microsim engine + gym-like env wrapper.
``ops``         NN building blocks: inits, fc/lstm, return computation, buffers,
                schedules.
``models``      Policies (LSTM/FC actor-critic, Q-nets) and algorithms
                (IA2C, MA2C, IQL-LR/DNN).
``parallel``    Mesh construction and sharded rollout/update steps.
``utils``       Counters, logging, CSV/experiment-dir management.
"""

__version__ = "0.1.0"
