"""Multi-agent RL algorithms: IA2C, MA2C, IQL (LR / DNN).

Replaces /root/reference/agents/models.py. The reference drives N separate
TF1 policy graphs with python loops (models.py:174-200, 333-363); here every
algorithm is a pair of pure jittable functions over agent-stacked parameters:

* ``act(params, obs, ...)``      — one batched forward for all agents/envs
* ``update(train_state, batch)`` — one batched backward for all agents

Hyperparameter parity (configs + models.py:53-81, 305-331):
RMSProp(decay=rmsp_alpha, eps=rmsp_epsilon, ms init = 1.0 like TF1) for the
A2C family; Adam for IQL; per-agent global-norm gradient clipping
(max_grad_norm); linear/constant schedules; reward normalization and clipping
applied by the caller before storage (models.py:123-129).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..ops.returns import nstep_returns
from ..ops.schedules import Scheduler
from .policies import (
    MultiAgentFcACPolicy, MultiAgentLstmACPolicy, MultiAgentQPolicy,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: dict
    opt_state: tuple


def per_agent_clip(grads, max_norm: float):
    """TF1 clip_by_global_norm applied per agent (leading axis of each leaf,
    ref policies.py:56-57): scale_i = max_norm / max(norm_i, max_norm)."""
    if max_norm <= 0:
        return grads
    leaves = jax.tree.leaves(grads)
    sq = sum(jnp.sum(g**2, axis=tuple(range(1, g.ndim))) for g in leaves)
    norm = jnp.sqrt(sq)  # [N]
    scale = max_norm / jnp.maximum(norm, max_norm)

    def apply(g):
        return g * scale.reshape((-1,) + (1,) * (g.ndim - 1))

    return jax.tree.map(apply, grads)


def _masked_entropy(pi, act_mask):
    logp = jnp.log(jnp.clip(pi, 1e-10, 1.0))
    ent = -jnp.sum(jnp.where(act_mask, pi * logp, 0.0), axis=-1)
    return ent, logp


class A2CBase:
    """Shared IA2C/MA2C machinery (ref models.py:132-229)."""

    use_fp = False
    name = "ia2c"

    def __init__(self, n_s_ls, n_a_ls, n_w_ls, n_f_ls, total_step, model_config,
                 seed=0):
        mc = model_config
        self.n_agent = len(n_s_ls)
        self.n_a_ls = list(n_a_ls)
        self.n_step = mc.batch_size
        self.reward_norm = mc.reward_norm
        self.reward_clip = mc.reward_clip
        self.gamma = mc.gamma
        self.v_coef = mc.value_coef
        self.max_grad_norm = mc.max_grad_norm
        self.seed = seed
        # actor_type 'lstm' -> LstmACPolicy/FPLstmACPolicy semantics;
        # 'fc' -> FcACPolicy/FPFcACPolicy (policies.py:214-282), stateless
        policy_cls = (
            MultiAgentFcACPolicy if getattr(mc, "actor_type", "lstm") == "fc"
            else MultiAgentLstmACPolicy
        )
        self.policy = policy_cls(
            n_s_ls, n_a_ls, n_w_ls,
            n_f_ls if self.use_fp else None,
            n_fc_wave=mc.num_fw, n_fc_wait=mc.num_ft,
            n_fc_fp=mc.num_fp, n_lstm=mc.num_lstm,
        )
        if mc.lr_decay == "constant":
            self.lr_scheduler = Scheduler(mc.lr_init, decay="constant")
        else:
            self.lr_scheduler = Scheduler(
                mc.lr_init, mc.lr_min, total_step, decay=mc.lr_decay
            )
        if mc.entropy_decay == "constant":
            self.beta_scheduler = Scheduler(mc.entropy_coef_init, decay="constant")
        else:
            self.beta_scheduler = Scheduler(
                mc.entropy_coef_init, mc.entropy_coef_min,
                total_step * mc.entropy_ratio, decay=mc.entropy_decay,
            )
        # TF1 RMSProp parity: accumulator initialized to ones
        self.opt = optax.scale_by_rms(
            decay=mc.rmsp_alpha, eps=mc.rmsp_epsilon, initial_scale=1.0
        )

    # ---- state --------------------------------------------------------
    def init_train_state(self) -> TrainState:
        params = self.policy.init(self.seed)
        return TrainState(params=params, opt_state=self.opt.init(params))

    def init_states(self):
        return self.policy.init_states()

    def normalize_reward(self, r):
        if self.reward_norm:
            r = r / self.reward_norm
        if self.reward_clip:
            r = jnp.clip(r, -self.reward_clip, self.reward_clip)
        return r

    # ---- pure functions ----------------------------------------------
    def act(self, params, obs, done, states, key):
        """obs [..., N, S], done scalar/[...] pre-decision.

        -> (action [..., N] i32, pi, v, new_states)
        """
        pi, v, new_states = self.policy.forward_step(
            params, obs, jnp.asarray(done, jnp.float32)[..., None, None], states
        )
        logits = jnp.log(jnp.clip(pi, 1e-10, 1.0))
        action = jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
        return action, pi, v, new_states

    def greedy_from_pi(self, pi):
        """Deterministic action from policy probs (perform(), utils.py:211)."""
        return jnp.argmax(pi, axis=-1).astype(jnp.int32)

    def value(self, params, obs, done, states):
        """Bootstrap value; does not advance LSTM state (policies.py:125-136)."""
        _, v, _ = self.policy.forward_step(
            params, obs, jnp.asarray(done, jnp.float32)[..., None, None], states
        )
        return v

    def fingerprint(self, pi):
        """policy[:-1] per agent (env.py:633-635), padded layout."""
        fp_w = self.policy.A - 1
        j = jnp.arange(fp_w)
        valid = j[None, :] < (jnp.asarray(self.n_a_ls)[:, None] - 1)
        return jnp.where(valid, pi[..., :fp_w], 0.0)

    def loss(self, params, batch, beta):
        """batch (all [T, B, ...]): obs [T,B,N,S], actions [T,B,N],
        rewards [T,B,N] (normalized), values [T,B,N] (rollout), dones_pre
        [T,B], dones_post [T,B], bootstrap [B,N], init_states ([B,N,H])."""
        pi, v = self.policy.forward_seq(
            params, batch["obs"], batch["dones_pre"][..., None, None],
            batch["init_states"],
        )
        ent, logp = _masked_entropy(pi, self.policy.act_mask)
        Rs, Advs = nstep_returns(
            batch["rewards"], batch["values"],
            batch["dones_post"][..., None], batch["bootstrap"], self.gamma,
        )
        a_oh = jax.nn.one_hot(batch["actions"], self.policy.A)
        logp_a = jnp.sum(logp * a_oh, axis=-1)
        # per-agent means over the [T, B] sample axes, summed over agents
        # (agents own disjoint parameters -> identical to independent updates)
        policy_loss = -(logp_a * jax.lax.stop_gradient(Advs)).mean(axis=(0, 1)).sum()
        value_loss = (
            0.5 * self.v_coef * ((jax.lax.stop_gradient(Rs) - v) ** 2)
            .mean(axis=(0, 1)).sum()
        )
        entropy_loss = -beta * ent.mean(axis=(0, 1)).sum()
        total = policy_loss + value_loss + entropy_loss
        return total, dict(
            policy_loss=policy_loss, value_loss=value_loss,
            entropy_loss=entropy_loss, total_loss=total,
        )

    def update(self, state: TrainState, batch, lr, beta):
        grads, metrics = jax.grad(self.loss, has_aux=True)(
            state.params, batch, beta
        )
        grads = per_agent_clip(grads, self.max_grad_norm)
        updates, opt_state = self.opt.update(grads, state.opt_state)
        params = jax.tree.map(lambda p, u: p - lr * u, state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params=params, opt_state=opt_state), metrics


class IA2C(A2CBase):
    name = "ia2c"
    use_fp = False


class A2C(A2CBase):
    """Centralized A2C (ref models.py:15-129): ONE LSTM actor-critic over the
    concatenated global observation, with a single softmax over the product
    action space; the global action is decoded to per-node local actions with
    the mixed-radix codec of ``_transfer_action`` (env.py:473-483).

    Only tractable on small scenarios (prod(n_a_ls) actions) — same limitation
    as the reference, where this model is vestigial.
    """

    name = "a2c"
    use_fp = False
    MAX_GLOBAL_ACTIONS = 4096

    def __init__(self, n_s_ls, n_a_ls, n_w_ls, total_step, model_config, seed=0):
        n_a_global = 1
        for p in n_a_ls:
            n_a_global *= int(p)
        if n_a_global > self.MAX_GLOBAL_ACTIONS:
            raise ValueError(
                f"centralized a2c needs prod(n_a_ls)={n_a_global} global "
                f"actions; only tractable on small scenarios"
            )
        n_s_total = int(sum(n_s_ls))
        n_w_total = int(sum(n_w_ls))
        super().__init__(
            [n_s_total], [n_a_global], [n_w_total], None, total_step,
            model_config, seed=seed,
        )
        self.n_agent_local = len(n_s_ls)
        self.local_n_a_ls = [int(a) for a in n_a_ls]
        # flatten gather: padded per-node obs rows [N, S_max] (row layout
        # [wave_n | wait_n], env agent='a2c' assembly) -> one global vector
        # ordered [all waves | all waits] to match the policy section masks
        n_idx, s_idx = [], []
        for n, (ns, nw) in enumerate(zip(n_s_ls, n_w_ls)):
            for s in range(int(ns) - int(nw)):
                n_idx.append(n)
                s_idx.append(s)
        for n, (ns, nw) in enumerate(zip(n_s_ls, n_w_ls)):
            for j in range(int(nw)):
                n_idx.append(n)
                s_idx.append(int(ns) - int(nw) + j)
        self._flat_n = jnp.asarray(n_idx)
        self._flat_s = jnp.asarray(s_idx)

    def _flatten_obs(self, obs):
        """[..., N, S_max] -> [..., 1, n_s_total]."""
        return obs[..., self._flat_n, self._flat_s][..., None, :]

    def encode_global(self, local):
        """Local actions [..., N] -> global [..., 1] (inverse of
        env.py:473-483's divmod chain: little-endian mixed radix)."""
        g = jnp.zeros(local.shape[:-1], jnp.int32)
        mult = 1
        for i, p in enumerate(self.local_n_a_ls):
            g = g + local[..., i] * mult
            mult *= p
        return g[..., None]

    def decode_global(self, g):
        """Global action [..., 1] -> local [..., N] (env.py:473-483)."""
        g = g[..., 0]
        outs = []
        for p in self.local_n_a_ls[:-1]:
            outs.append(g % p)
            g = g // p
        outs.append(g)
        return jnp.stack(outs, axis=-1).astype(jnp.int32)

    def act(self, params, obs, done, states, key):
        action, pi, v, new_states = super().act(
            params, self._flatten_obs(obs), done, states, key
        )
        return self.decode_global(action), pi, v, new_states

    def greedy_from_pi(self, pi):
        return self.decode_global(jnp.argmax(pi, axis=-1).astype(jnp.int32))

    def value(self, params, obs, done, states):
        return super().value(params, self._flatten_obs(obs), done, states)

    def loss(self, params, batch, beta):
        b = dict(batch)
        b["obs"] = self._flatten_obs(batch["obs"])
        b["actions"] = self.encode_global(batch["actions"])
        # the traffic env broadcasts the summed global reward over nodes for
        # a2c (env.py:593); the mean recovers it exactly there and gives the
        # correct joint signal for per-agent-reward debug envs
        b["rewards"] = batch["rewards"].mean(axis=-1, keepdims=True)
        return super().loss(params, b, beta)


class MA2C(A2CBase):
    name = "ma2c"
    use_fp = True

    def __init__(self, n_s_ls, n_a_ls, n_w_ls, n_f_ls, total_step, model_config,
                 seed=0):
        super().__init__(
            n_s_ls, n_a_ls, n_w_ls, n_f_ls, total_step, model_config, seed
        )


class IQL:
    """Independent Q-learning (ref models.py:264-376): DQN loss with a
    same-network stop-gradient target (policies.py:315-322), Adam, epsilon-
    greedy exploration, 10 replay minibatches per env batch (models.py:338)."""

    use_fp = False

    def __init__(self, n_s_ls, n_a_ls, n_w_ls, total_step, model_config, seed=0,
                 model_type="dqn"):
        mc = model_config
        self.name = "iql"
        self.model_type = model_type
        self.n_agent = len(n_s_ls)
        self.n_a_ls = list(n_a_ls)
        self.n_step = mc.batch_size
        self.reward_norm = mc.reward_norm
        self.reward_clip = mc.reward_clip
        self.gamma = mc.gamma
        self.max_grad_norm = mc.max_grad_norm
        self.buffer_size = int(mc.buffer_size)
        self.n_minibatch = 10
        # reference-exact without-replacement minibatch draws on request
        # (random.sample semantics, agents/utils.py:253)
        self.replay_without_replacement = (
            getattr(mc, "replay_sampling", "with") == "without"
        )
        self.seed = seed
        self.policy = MultiAgentQPolicy(
            n_s_ls, n_a_ls, n_w_ls, model_type=model_type,
            n_fc0=mc.num_fc, n_fc=mc.num_h,
        )
        if mc.lr_decay == "constant":
            self.lr_scheduler = Scheduler(mc.lr_init, decay="constant")
        else:
            self.lr_scheduler = Scheduler(
                mc.lr_init, mc.lr_min, total_step, decay=mc.lr_decay
            )
        if mc.epsilon_decay == "constant":
            self.eps_scheduler = Scheduler(mc.epsilon_init, decay="constant")
        else:
            self.eps_scheduler = Scheduler(
                mc.epsilon_init, mc.epsilon_min,
                total_step * mc.epsilon_ratio, decay=mc.epsilon_decay,
            )
        self.opt = optax.scale_by_adam()

    def init_train_state(self) -> TrainState:
        params = self.policy.init(self.seed)
        return TrainState(params=params, opt_state=self.opt.init(params))

    def init_states(self):
        return None  # feed-forward

    def normalize_reward(self, r):
        if self.reward_norm:
            r = r / self.reward_norm
        if self.reward_clip:
            r = jnp.clip(r, -self.reward_clip, self.reward_clip)
        return r

    def act(self, params, obs, key, eps, stochastic=False):
        """epsilon-greedy per agent (models.py:347-363). obs [..., N, S]."""
        q = self.policy.q_values(params, obs)
        greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
        k_eps, k_rand, k_st = jax.random.split(key, 3)
        n_a = jnp.asarray(self.n_a_ls)
        explore = jax.random.uniform(k_eps, greedy.shape) < eps
        rand = (
            jax.random.uniform(k_rand, greedy.shape) * n_a
        ).astype(jnp.int32)
        if stochastic:
            qs = jnp.clip(q, 1e-8, None)
            p = qs / qs.sum(-1, keepdims=True)
            pick = jax.random.categorical(k_st, jnp.log(p), axis=-1).astype(jnp.int32)
        else:
            pick = greedy
        return jnp.where(explore, rand, pick), q

    def td_loss(self, params, batch):
        """batch leaves [..., N, ...]: obs, actions, rewards, next_obs, dones."""
        q0s = self.policy.q_values(params, batch["obs"])
        q1s = self.policy.q_values(params, batch["next_obs"])
        a_oh = jax.nn.one_hot(batch["actions"], self.policy.A)
        q0 = jnp.sum(q0s * a_oh, axis=-1)
        q1 = jnp.max(q1s, axis=-1)
        done = batch["dones"].astype(jnp.float32)
        tq = jax.lax.stop_gradient(
            batch["rewards"] + (1.0 - done[..., None]) * self.gamma * q1
        )
        # per-agent mean over samples, summed over agents
        loss = ((q0 - tq) ** 2).mean(axis=tuple(range(q0.ndim - 1))).sum()
        return loss, dict(loss=loss, q=q0.mean(), tq=tq.mean())

    def update_minibatch(self, state: TrainState, batch, lr):
        grads, metrics = jax.grad(self.td_loss, has_aux=True)(state.params, batch)
        grads = per_agent_clip(grads, self.max_grad_norm)
        updates, opt_state = self.opt.update(grads, state.opt_state)
        params = jax.tree.map(lambda p, u: p - lr * u, state.params, updates)
        return TrainState(params=params, opt_state=opt_state), metrics


def make_algorithm(agent: str, env, total_step: int, model_config, seed=0):
    """Factory matching main.py:110-121."""
    if agent == "a2c":
        return A2C(env.n_s_ls, env.n_a_ls, env.n_w_ls, total_step,
                   model_config, seed=seed)
    if agent == "ia2c":
        return IA2C(env.n_s_ls, env.n_a_ls, env.n_w_ls, None, total_step,
                    model_config, seed=seed)
    if agent == "ma2c":
        return MA2C(env.n_s_ls, env.n_a_ls, env.n_w_ls, env.n_f_ls, total_step,
                    model_config, seed=seed)
    if agent == "iqld":
        return IQL(env.n_s_ls, env.n_a_ls, env.n_w_ls, total_step, model_config,
                   seed=seed, model_type="dqn")
    if agent == "iqll":
        return IQL(env.n_s_ls, env.n_a_ls, env.n_w_ls, total_step, model_config,
                   seed=seed, model_type="lr")
    raise ValueError(f"unknown agent {agent!r}")
