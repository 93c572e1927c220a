"""Stacked multi-agent policy networks.

Replaces the reference's per-agent TF1 policy graphs
(/root/reference/agents/policies.py) with ONE set of parameters carrying a
leading agent axis: heterogeneous per-agent dimensions are padded to common
widths, section-masked at the input, and evaluated for all N agents in a few
batched einsums (MXU) instead of N sequential ``sess.run`` calls
(models.py:185-200).

Architecture parity (policies.py:75-211):
* observation layout [wave | wait | fingerprint] (env _get_state ordering)
  is split into per-section FC heads: fc_wave(num_fw=128),
  fc_wait(num_ft=32), fc_fp(num_fp=64, ma2c only), ReLU, concatenated;
* a 64-unit LSTM with done-reset; **separate** pi and v networks each with
  their own LSTM state (policies.py:89-96);
* pi head = masked softmax over padded action dim; v head = scalar.

Init parity: each agent's section submatrix is orthogonally initialized at
its true (unpadded) size and embedded in the padded matrix; padded rows stay
zero forever because inputs are masked (zero gradients outside the section).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.initializers import ortho_init
from ..ops.layers import lstm_scan, lstm_step

NEG_INF = -1e9


def _section_masks(n_s_ls, n_w_ls, n_f_ls, S):
    """Boolean masks [N, S] for the wave / wait / fp sections of the padded
    observation, following the env's assembly order."""
    N = len(n_s_ls)
    wave = np.zeros((N, S), bool)
    wait = np.zeros((N, S), bool)
    fp = np.zeros((N, S), bool)
    for n in range(N):
        nf, nw = n_f_ls[n], n_w_ls[n]
        n_wave = n_s_ls[n] - nw - nf
        wave[n, :n_wave] = True
        wait[n, n_wave : n_wave + nw] = True
        fp[n, n_wave + nw : n_wave + nw + nf] = True
    return wave, wait, fp


def _stack_fc(rng, n_in_ls, n_out, S):
    """Per-agent fc over a padded input of width S; agent i's weight rows are
    ortho-initialized only where its section lives (callers pre-shift the
    section to the weight rows via masking + the fixed section offsets)."""
    N = len(n_in_ls)
    w = np.zeros((N, S, n_out), np.float32)
    b = np.zeros((N, n_out), np.float32)
    return w, b


class MultiAgentLstmACPolicy:
    """LstmACPolicy / FPLstmACPolicy (fingerprint variant) stacked over agents."""

    def __init__(
        self,
        n_s_ls: List[int],
        n_a_ls: List[int],
        n_w_ls: List[int],
        n_f_ls: Optional[List[int]] = None,
        n_fc_wave: int = 128,
        n_fc_wait: int = 32,
        n_fc_fp: int = 64,
        n_lstm: int = 64,
    ):
        self.n_agent = N = len(n_s_ls)
        self.n_s_ls = list(n_s_ls)
        self.n_a_ls = list(n_a_ls)
        self.n_w_ls = list(n_w_ls)
        self.n_f_ls = list(n_f_ls) if n_f_ls is not None else [0] * N
        self.S = max(n_s_ls)
        self.A = max(n_a_ls)
        self.n_lstm = n_lstm
        self.n_fc_wave, self.n_fc_wait, self.n_fc_fp = n_fc_wave, n_fc_wait, n_fc_fp
        self.use_wait = any(w > 0 for w in self.n_w_ls)
        self.use_fp = any(f > 0 for f in self.n_f_ls)
        wave, wait, fp = _section_masks(self.n_s_ls, self.n_w_ls, self.n_f_ls, self.S)
        self.wave_mask = jnp.asarray(wave.astype(np.float32))
        self.wait_mask = jnp.asarray(wait.astype(np.float32))
        self.fp_mask = jnp.asarray(fp.astype(np.float32))
        self.act_mask = jnp.asarray(
            np.arange(self.A)[None, :] < np.asarray(self.n_a_ls)[:, None]
        )
        self._wave_rows = wave
        self._wait_rows = wait
        self._fp_rows = fp
        self.h_dim = (
            n_fc_wave
            + (n_fc_wait if self.use_wait else 0)
            + (n_fc_fp if self.use_fp else 0)
        )

    # ---- init ---------------------------------------------------------
    def _init_head(self, rng, rows_mask, n_out):
        N = self.n_agent
        w = np.zeros((N, self.S, n_out), np.float32)
        for n in range(N):
            rows = np.where(rows_mask[n])[0]
            if len(rows):
                w[n, rows, :] = ortho_init(rng, (len(rows), n_out))
        return {"w": jnp.asarray(w), "b": jnp.zeros((N, n_out), jnp.float32)}

    def _init_lstm(self, rng):
        N, H = self.n_agent, self.n_lstm
        wx = np.stack([ortho_init(rng, (self.h_dim, 4 * H)) for _ in range(N)])
        wh = np.stack([ortho_init(rng, (H, 4 * H)) for _ in range(N)])
        return {
            "wx": jnp.asarray(wx),
            "wh": jnp.asarray(wh),
            "b": jnp.zeros((N, 4 * H), jnp.float32),
        }

    def _init_out(self, rng, n_out):
        N = self.n_agent
        w = np.stack([ortho_init(rng, (self.n_lstm, n_out)) for _ in range(N)])
        return {"w": jnp.asarray(w), "b": jnp.zeros((N, n_out), jnp.float32)}

    def _init_net(self, rng, n_out):
        net = {
            "fcw": self._init_head(rng, self._wave_rows, self.n_fc_wave),
            "lstm": self._init_lstm(rng),
            "out": self._init_out(rng, n_out),
        }
        if self.use_wait:
            net["fct"] = self._init_head(rng, self._wait_rows, self.n_fc_wait)
        if self.use_fp:
            net["fcf"] = self._init_head(rng, self._fp_rows, self.n_fc_fp)
        return net

    def init(self, seed: int = 0):
        rng = np.random.default_rng(seed)
        return {"pi": self._init_net(rng, self.A), "v": self._init_net(rng, 1)}

    def init_states(self):
        z = jnp.zeros((self.n_agent, self.n_lstm), jnp.float32)
        return {"pi": (z, z), "v": (z, z)}

    # ---- forward ------------------------------------------------------
    def _features(self, net, obs):
        """obs [..., N, S] -> LSTM input [..., N, h_dim]."""
        hs = [self._fc(net["fcw"], obs * self.wave_mask)]
        if self.use_fp:
            hs.append(self._fc(net["fcf"], obs * self.fp_mask))
        if self.use_wait:
            hs.append(self._fc(net["fct"], obs * self.wait_mask))
        return jnp.concatenate(hs, axis=-1)

    @staticmethod
    def _fc(p, x):
        return jax.nn.relu(jnp.einsum("...ni,nio->...no", x, p["w"]) + p["b"])

    def _out(self, net, h):
        return jnp.einsum("...nh,nho->...no", h, net["out"]["w"]) + net["out"]["b"]

    def _head_pi(self, net, h):
        logits = self._out(net, h)
        logits = jnp.where(self.act_mask, logits, NEG_INF)
        return jax.nn.softmax(logits, axis=-1)

    def forward_step(self, params, obs, done, states):
        """One control step. obs [N, S]; done scalar (pre-decision reset).

        -> (pi [N, A], v [N], new_states)
        """
        x_pi = self._features(params["pi"], obs)
        x_v = self._features(params["v"], obs)
        h_pi, c_pi = lstm_step(params["pi"]["lstm"], x_pi, done, states["pi"])
        h_v, c_v = lstm_step(params["v"]["lstm"], x_v, done, states["v"])
        pi = self._head_pi(params["pi"], h_pi)
        v = self._out(params["v"], h_v)[..., 0]
        return pi, v, {"pi": c_pi, "v": c_v}

    def forward_seq(self, params, obs_seq, dones, init_states):
        """Training-time re-run over a [T, N, S] window from the snapshot
        states (replicates the backward graph, policies.py:94-96, 138-155)."""
        x_pi = self._features(params["pi"], obs_seq)
        x_v = self._features(params["v"], obs_seq)
        h_pi, _ = lstm_scan(params["pi"]["lstm"], x_pi, dones, init_states["pi"])
        h_v, _ = lstm_scan(params["v"]["lstm"], x_v, dones, init_states["v"])
        pi = self._head_pi(params["pi"], h_pi)
        v = self._out(params["v"], h_v)[..., 0]
        return pi, v


class MultiAgentFcACPolicy(MultiAgentLstmACPolicy):
    """FcACPolicy / FPFcACPolicy stacked over agents (policies.py:214-282):
    the section FC heads feed a second FC layer of width ``n_lstm`` instead
    of a recurrent cell, so the policy is stateless. (The reference's
    FPFcACPolicy._build_net references an undefined ``ob`` and can never be
    instantiated; this is the repaired semantics.) Exposes the same
    step/seq/state interface as the LSTM policy so algorithms are agnostic."""

    def _init_net(self, rng, n_out):
        net = {
            "fcw": self._init_head(rng, self._wave_rows, self.n_fc_wave),
            "fc": {
                "w": jnp.asarray(
                    np.stack([
                        ortho_init(rng, (self.h_dim, self.n_lstm))
                        for _ in range(self.n_agent)
                    ])
                ),
                "b": jnp.zeros((self.n_agent, self.n_lstm), jnp.float32),
            },
            "out": self._init_out(rng, n_out),
        }
        if self.use_wait:
            net["fct"] = self._init_head(rng, self._wait_rows, self.n_fc_wait)
        if self.use_fp:
            net["fcf"] = self._init_head(rng, self._fp_rows, self.n_fc_fp)
        return net

    def init_states(self):
        # stateless: zero-width carry keeps the (c, h) pytree structure
        z = jnp.zeros((self.n_agent, 0), jnp.float32)
        return {"pi": (z, z), "v": (z, z)}

    def _hidden(self, net, obs):
        return self._fc(net["fc"], self._features(net, obs))

    def forward_step(self, params, obs, done, states):
        h_pi = self._hidden(params["pi"], obs)
        h_v = self._hidden(params["v"], obs)
        pi = self._head_pi(params["pi"], h_pi)
        v = self._out(params["v"], h_v)[..., 0]
        return pi, v, states

    def forward_seq(self, params, obs_seq, dones, init_states):
        h_pi = self._hidden(params["pi"], obs_seq)
        h_v = self._hidden(params["v"], obs_seq)
        pi = self._head_pi(params["pi"], h_pi)
        v = self._out(params["v"], h_v)[..., 0]
        return pi, v


class MultiAgentQPolicy:
    """DeepQPolicy / LRQPolicy stacked over agents (policies.py:341-389).

    model_type 'dqn': split [wave|wait] -> fc(num_fc=128) + fc(num_fc/4),
    concat -> fc(num_h=64) -> linear q head.
    model_type 'lr': single linear layer over the full observation.
    """

    def __init__(
        self,
        n_s_ls,
        n_a_ls,
        n_w_ls,
        model_type: str = "dqn",
        n_fc0: int = 128,
        n_fc: int = 64,
    ):
        self.n_agent = N = len(n_s_ls)
        self.model_type = model_type
        self.n_s_ls = list(n_s_ls)
        self.n_a_ls = list(n_a_ls)
        self.n_w_ls = list(n_w_ls)
        self.S = max(n_s_ls)
        self.A = max(n_a_ls)
        self.n_fc0, self.n_fc = n_fc0, n_fc
        wave, wait, _ = _section_masks(self.n_s_ls, self.n_w_ls, [0] * N, self.S)
        self.use_wait = any(w > 0 for w in self.n_w_ls) and model_type == "dqn"
        # LRQPolicy consumes the whole observation in one linear layer
        if model_type == "lr":
            wave = wave | wait
        self.wave_mask = jnp.asarray(wave.astype(np.float32))
        self.wait_mask = jnp.asarray(wait.astype(np.float32))
        self._wave_rows, self._wait_rows = wave, wait
        self.act_mask = jnp.asarray(
            np.arange(self.A)[None, :] < np.asarray(self.n_a_ls)[:, None]
        )

    def _init_head(self, rng, rows_mask, n_out):
        N = self.n_agent
        w = np.zeros((N, self.S, n_out), np.float32)
        for n in range(N):
            rows = np.where(rows_mask[n])[0]
            if len(rows):
                w[n, rows, :] = ortho_init(rng, (len(rows), n_out))
        return {"w": jnp.asarray(w), "b": jnp.zeros((N, n_out), jnp.float32)}

    def _init_mid(self, rng, n_in, n_out):
        N = self.n_agent
        w = np.stack([ortho_init(rng, (n_in, n_out)) for _ in range(N)])
        return {"w": jnp.asarray(w), "b": jnp.zeros((N, n_out), jnp.float32)}

    def init(self, seed: int = 0):
        rng = np.random.default_rng(seed)
        if self.model_type == "lr":
            return {"q": self._init_head(rng, self._wave_rows, self.A)}
        params = {
            "fcw": self._init_head(rng, self._wave_rows, self.n_fc0),
            "fct": (
                self._init_head(rng, self._wait_rows, self.n_fc0 // 4)
                if self.use_wait
                else None
            ),
        }
        h_in = self.n_fc0 + (self.n_fc0 // 4 if self.use_wait else 0)
        params["fc"] = self._init_mid(rng, h_in, self.n_fc)
        params["q"] = self._init_mid(rng, self.n_fc, self.A)
        return params

    @staticmethod
    def _fc(p, x, act=jax.nn.relu):
        z = jnp.einsum("...ni,nio->...no", x, p["w"]) + p["b"]
        return act(z) if act is not None else z

    def q_values(self, params, obs):
        """obs [..., N, S] -> q [..., N, A] (invalid actions = -inf)."""
        if self.model_type == "lr":
            q = self._fc(params["q"], obs * self.wave_mask, act=None)
        else:
            hs = [self._fc(params["fcw"], obs * self.wave_mask)]
            if self.use_wait:
                hs.append(self._fc(params["fct"], obs * self.wait_mask))
            h = jnp.concatenate(hs, axis=-1)
            h = self._fc(params["fc"], h)
            q = self._fc(params["q"], h, act=None)
        return jnp.where(self.act_mask, q, NEG_INF)
