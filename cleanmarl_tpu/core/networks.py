"""Functional neural-network core: plain-pytree params + pure apply fns.

Design: instead of an object-oriented module system (the reference uses
torch ``nn.Module`` / flax ``nnx``, e.g. /root/reference/cleanmarl/
vdn.py:79-95, vdn_jax.py:77-109), parameters are plain nested dicts of
``jnp`` arrays and every forward is a pure function. This makes vmap over
the agent axis, scan over time, sharding annotations, and donation
trivial, and keeps every op visible to XLA for fusion.

Architectures provided (dims follow the reference's defaults — MLPs of
hidden 64-128, 1-2 layers, ReLU):

- ``mlp``            — Q-network / critic trunk (vdn.py:79-95)
- ``masked_q``       — avail-action masking with a large negative
                       (reference uses -inf masked_fill, vdn.py:93-94;
                       we use a finite constant so that an all-masked row
                       cannot produce NaNs under softmax)
- ``gru``            — GRUCell matching torch semantics (the reference's
                       "lstm" files actually use GRU, vdn_lstm.py:88)
- ``hyper_mixer``    — QMIX monotonic mixing hypernetwork
                       (qmix.py:98-123)

Initialization is orthogonal for kernels (as in the reference JAX ports,
vdn_jax.py:80-90) and zeros for biases.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import chex
import jax
import jax.numpy as jnp

MASK_NEG = -1e9


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def orthogonal(key: chex.PRNGKey, shape, gain: float = 1.0, dtype=jnp.float32):
    """Orthogonal init (QR of a Gaussian), matching
    jax.nn.initializers.orthogonal semantics."""
    return jax.nn.initializers.orthogonal(scale=gain)(key, shape, dtype)


def dense_init(key, in_dim: int, out_dim: int, gain: float = math.sqrt(2.0)):
    wkey, _ = jax.random.split(key)
    return {
        "w": orthogonal(wkey, (in_dim, out_dim), gain=gain),
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


def matmul(x, w, dtype=None):
    """x @ w, optionally running the MXU in a reduced dtype.

    ``dtype=jnp.bfloat16`` casts both operands at the matmul and
    accumulates in f32 (``preferred_element_type``) — the standard TPU
    mixed-precision recipe. Activations, carries and params stay f32;
    only the contraction runs reduced. ``None`` = plain f32 matmul.
    """
    if dtype is None:
        return x @ w
    return jax.lax.dot_general(
        x.astype(dtype), w.astype(dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def dense(params, x, dtype=None):
    return matmul(x, params["w"], dtype) + params["b"]


# ---------------------------------------------------------------------------
# MLP
# ---------------------------------------------------------------------------

def mlp_init(
    key: chex.PRNGKey,
    in_dim: int,
    hidden_dim: int,
    out_dim: int,
    num_layers: int = 1,
    final_gain: float = 1.0,
):
    """Trunk of ``num_layers + 1`` hidden Linear+ReLU then a Linear head —
    the same depth convention as the reference's Qnetwrok
    (/root/reference/cleanmarl/vdn.py:79-95: one input layer, num_layer
    hidden layers, one output layer)."""
    n_hidden = num_layers + 1
    keys = jax.random.split(key, n_hidden + 1)
    layers = []
    d = in_dim
    for i in range(n_hidden):
        layers.append(dense_init(keys[i], d, hidden_dim))
        d = hidden_dim
    head = dense_init(keys[-1], d, out_dim, gain=final_gain)
    return {"layers": layers, "head": head}


def mlp_apply(params, x, activation: Callable = jax.nn.relu, dtype=None):
    for layer in params["layers"]:
        x = activation(dense(layer, x, dtype))
    return dense(params["head"], x, dtype)


def masked_q(q: chex.Array, avail: Optional[chex.Array]) -> chex.Array:
    """Mask unavailable actions to a large negative (vdn.py:93-94)."""
    if avail is None:
        return q
    return jnp.where(avail.astype(bool), q, MASK_NEG)


# ---------------------------------------------------------------------------
# GRU cell (torch nn.GRUCell semantics — vdn_lstm.py:88)
# ---------------------------------------------------------------------------

def gru_init(key: chex.PRNGKey, in_dim: int, hidden_dim: int):
    """Gates stored fused in torch's (r, z, n) order: one (in, 3H) input
    projection and one (H, 3H) recurrent projection, so a cell step is
    two MXU matmuls instead of six. Each H-wide gate block is
    orthogonally initialized independently (as torch initializes each
    gate), then concatenated."""
    k = jax.random.split(key, 6)
    def mat(kk, d_in):
        return orthogonal(kk, (d_in, hidden_dim), gain=1.0)
    return {
        "wi": jnp.concatenate([mat(k[0], in_dim), mat(k[1], in_dim),
                               mat(k[2], in_dim)], axis=-1),
        "wh": jnp.concatenate([mat(k[3], hidden_dim), mat(k[4], hidden_dim),
                               mat(k[5], hidden_dim)], axis=-1),
        "bi": jnp.zeros((3 * hidden_dim,)),
        "bh": jnp.zeros((3 * hidden_dim,)),
    }


def gru_apply_pre(params, h: chex.Array, gi: chex.Array, dtype=None) -> chex.Array:
    """GRU cell step from a precomputed input projection
    ``gi = x @ wi + bi`` (..., 3H). Only the recurrent projection
    ``h @ wh`` and the gating run here — the sequential critical path
    when scanning over time (see ``rnn_seq_apply``)."""
    gh = matmul(h, params["wh"], dtype) + params["bh"]   # (..., 3H)
    ir, iz, in_ = jnp.split(gi, 3, axis=-1)
    hr, hz, hn = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(ir + hr)
    z = jax.nn.sigmoid(iz + hz)
    n = jnp.tanh(in_ + r * hn)
    return (1.0 - z) * n + z * h


def gru_apply(params, h: chex.Array, x: chex.Array) -> chex.Array:
    """h' = GRUCell(x, h). Shapes: x (..., in_dim), h (..., hidden).
    Matches torch nn.GRUCell semantics (vdn_lstm.py:88) with the reset
    gate applied to the *projected* hidden contribution."""
    return gru_apply_pre(params, h, x @ params["wi"] + params["bi"])


# ---------------------------------------------------------------------------
# Recurrent Q-net / actor trunk: fc1 -> relu -> GRU -> fc2
# (vdn_lstm.py:83-99, ippo_lstm.py:161-183)
# ---------------------------------------------------------------------------

def rnn_init(key, in_dim: int, hidden_dim: int, out_dim: int, final_gain: float = 1.0):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fc1": dense_init(k1, in_dim, hidden_dim),
        "gru": gru_init(k2, hidden_dim, hidden_dim),
        "head": dense_init(k3, hidden_dim, out_dim, gain=final_gain),
    }


def rnn_apply(params, h, x):
    """Returns (h', out). x (..., in_dim), h (..., hidden_dim)."""
    z = jax.nn.relu(dense(params["fc1"], x))
    h2 = gru_apply(params["gru"], h, z)
    return h2, dense(params["head"], h2)


def gru_input_proj(params, x, dtype=None):
    """Input side of the fc1→GRU core batched over any leading dims:
    ``relu(fc1(x)) @ wi + bi`` → (..., 3H). Precompute this over a whole
    (T, ...) sequence, then step with ``gru_apply_pre`` in the scan."""
    z = jax.nn.relu(dense(params["fc1"], x, dtype))
    return matmul(z, params["gru"]["wi"], dtype) + params["gru"]["bi"]


def _rnn_seq_apply_pallas(params, h0, x_seq, reset_seq, dtype):
    """Fused-kernel path of ``rnn_seq_apply`` (ops/pallas_gru.py): the
    whole time loop runs inside one Pallas program per batch tile, with
    the hidden state resident in VMEM. Numerics match the scan path."""
    from cleanmarl_tpu.ops.pallas_gru import gru_seq

    gi = gru_input_proj(params, x_seq, dtype)          # (T, ..., 3H)
    T = gi.shape[0]
    batch_shape = gi.shape[1:-1]
    three_h = gi.shape[-1]
    H = three_h // 3
    m0 = 1
    for d in batch_shape:
        m0 *= d
    if reset_seq is None:
        keep = jnp.ones((T,) + batch_shape, jnp.float32)
    else:
        r = reset_seq.reshape(
            reset_seq.shape
            + (1,) * (1 + len(batch_shape) - reset_seq.ndim)
        )
        keep = jnp.broadcast_to(
            1.0 - r.astype(jnp.float32), (T,) + batch_shape
        )
    gi_f = gi.reshape(T, m0, three_h)
    h0_f = h0.reshape(m0, H)
    keep_f = keep.reshape(T, m0, 1)
    pad = (-m0) % 8
    if pad:
        gi_f = jnp.pad(gi_f, ((0, 0), (0, pad), (0, 0)))
        h0_f = jnp.pad(h0_f, ((0, pad), (0, 0)))
        keep_f = jnp.pad(keep_f, ((0, 0), (0, pad), (0, 0)))
    h_final, h_seq = gru_seq(
        params["gru"]["wh"], params["gru"]["bh"], h0_f, gi_f, keep_f
    )
    if pad:
        h_final = h_final[:m0]
        h_seq = h_seq[:, :m0]
    h_final = h_final.reshape(batch_shape + (H,))
    h_seq = h_seq.reshape((T,) + batch_shape + (H,))
    return h_final, dense(params["head"], h_seq, dtype)


def resolve_gru_impl(impl: str, hidden_dim: int, tbptt: int = 0,
                     bf16: bool = False) -> str:
    """Resolve ``gru_impl="auto"`` → "pallas" | "xla".

    The fused Pallas GRU (ops/pallas_gru.py) is at parity with the XLA
    scan at hidden 128 and wins outright at wide hidden — +9% steps/s
    and −32% compiled HBM at 256, −5G HBM on 27m_vs_30m (round-4 sweep,
    validation/bench_sweep_r4_wide.jsonl) — so "auto" picks it exactly
    where it is the measured winner: on a real TPU backend with
    hidden ≥ 256, outside the kernel's unsupported modes (tbptt,
    bf16 operands). Explicit "xla"/"pallas" are passed through.
    """
    if impl != "auto":
        return impl
    if tbptt or bf16:
        return "xla"
    try:
        d = jax.devices()[0]
        on_tpu = (
            d.platform == "tpu"
            or "tpu" in str(getattr(d, "device_kind", "")).lower()
        )
    except RuntimeError:  # no backend available (init failure)
        on_tpu = False
    return "pallas" if (on_tpu and hidden_dim >= 256) else "xla"


def rnn_seq_apply(params, h0, x_seq, reset_seq=None, tbptt: int = 0,
                  dtype=None, impl: str = "xla"):
    """fc1→GRU→head over a time-major sequence ``x_seq (T, ..., in_dim)``
    with the whole input side and the head hoisted OUT of the scan.

    TPU rationale: a naive per-step ``rnn_apply`` scan puts four matmuls
    on the sequential critical path (fc1, gru-wi, gru-wh, head). When
    the inputs for all T steps are known up front (every training-time
    sequence recompute — PPO epochs, recurrent-Q targets, COMA/MADDPG
    actor rescans), fc1/gru-wi/head are time-independent and batch into
    three (T·B·n, ·) matmuls that tile the MXU far better; only the
    (·, H)x(H, 3H) recurrent projection + gating remain sequential —
    ~3x less work on the scan's critical path at hidden 128.

    ``reset_seq (T, ...)`` (bool): the carry is zeroed AFTER emitting
    step t's output wherever reset_seq[t] is set (episode boundaries).
    ``tbptt=k``: stop gradients through the carry every k steps (the
    reference's chunked TBPTT, qmix_lstm.py:350-363, as a scan-native
    stop-gradient carry).

    Returns ``(h_final, out_seq (T, ..., out_dim))``.
    """
    if impl == "pallas":
        if tbptt:
            raise ValueError("impl='pallas' does not support tbptt>0 "
                             "(use the xla scan path)")
        if dtype is not None:
            # the fused kernel's recurrent matmul is f32; silently mixing
            # it with reduced-dtype input projections would diverge from
            # the scan path's numerics
            raise ValueError(
                "impl='pallas' does not support a reduced compute dtype "
                "(use the xla scan path for bfloat16 matmuls)"
            )
        return _rnn_seq_apply_pallas(params, h0, x_seq, reset_seq, dtype)
    gi = gru_input_proj(params, x_seq, dtype)               # (T, ..., 3H)
    if reset_seq is not None:
        # broadcast (T, batch...) flags up to the carry's rank
        reset_seq = reset_seq.reshape(
            reset_seq.shape + (1,) * (h0.ndim + 1 - reset_seq.ndim)
        )

    def body(carry, inp):
        h, t = carry
        gi_t, reset = inp
        if tbptt:
            h = jax.lax.cond(
                jnp.mod(t, tbptt) == 0,
                jax.lax.stop_gradient,
                lambda v: v,
                h,
            )
        h2 = gru_apply_pre(params["gru"], h, gi_t, dtype)
        h_next = h2 if reset is None else jnp.where(reset, 0.0, h2)
        return (h_next, t + 1), h2

    carry0 = (h0, jnp.zeros((), jnp.int32))
    if reset_seq is None:
        (h_final, _), h_seq = jax.lax.scan(
            lambda c, gi_t: body(c, (gi_t, None)), carry0, gi
        )
    else:
        (h_final, _), h_seq = jax.lax.scan(body, carry0, (gi, reset_seq))
    return h_final, dense(params["head"], h_seq, dtype)


def rnn_seq_eval_next(params, h0, obs_seq, next_obs_seq, dtype=None):
    """Target-evaluation pattern shared by the off-policy recurrent
    algorithms (recurrent-Q targets, MADDPG target actor): advance the
    hidden stream on ``obs_t`` and evaluate the head one GRU step ahead
    on ``next_obs_t`` — the scanned form of the reference's carried
    (h_target, h_utility) pair (vdn_lstm_jax.py:286-325); within an
    episode next_obs_t == obs_{t+1}, and the one-step-ahead evaluation
    is exact at terminal steps.

    Both input projections are precomputed in two batched matmuls
    (``gru_input_proj``); the scan keeps only the two recurrent
    projections + gating. Returns ``out_seq (T, ..., out_dim)``.
    """
    gi_obs = gru_input_proj(params, obs_seq, dtype)
    gi_next = gru_input_proj(params, next_obs_seq, dtype)

    def body(h, inp):
        gio, gin = inp
        h2 = gru_apply_pre(params["gru"], h, gio, dtype)
        h_eval = gru_apply_pre(params["gru"], h2, gin, dtype)
        return h2, h_eval

    _, h_eval = jax.lax.scan(body, h0, (gi_obs, gi_next))
    return dense(params["head"], h_eval, dtype)


def rnn_initial_state(batch_shape, hidden_dim: int) -> chex.Array:
    return jnp.zeros(tuple(batch_shape) + (hidden_dim,), jnp.float32)


# ---------------------------------------------------------------------------
# QMIX monotonic mixing hypernetwork (qmix.py:98-123)
# ---------------------------------------------------------------------------

def mixer_init(key, n_agents: int, state_dim: int, embed_dim: int, hyper_dim: int):
    """Hypernetworks from the global state produce the mixing weights:
    |W1| (n_agents×embed), b1, |W2| (embed×1), b2 with non-negative W via
    abs — guaranteeing monotonicity in each agent utility
    (qmix.py:110-123)."""
    k = jax.random.split(key, 4)
    return {
        "hw1": mlp_init(k[0], state_dim, hyper_dim, n_agents * embed_dim, num_layers=0),
        "hb1": dense_init(k[1], state_dim, embed_dim, gain=1.0),
        "hw2": mlp_init(k[2], state_dim, hyper_dim, embed_dim, num_layers=0),
        "hb2": mlp_init(k[3], state_dim, hyper_dim, 1, num_layers=0),
    }


def mixer_apply(params, agent_qs: chex.Array, state: chex.Array) -> chex.Array:
    """agent_qs (..., n_agents), state (..., state_dim) → Q_tot (...).

    Dims are recovered from weight shapes (static at trace time)."""
    embed_dim = params["hb1"]["b"].shape[0]
    n_agents = params["hw1"]["head"]["b"].shape[0] // embed_dim
    w1 = jnp.abs(mlp_apply(params["hw1"], state))
    w1 = w1.reshape(state.shape[:-1] + (n_agents, embed_dim))
    b1 = dense(params["hb1"], state)
    w2 = jnp.abs(mlp_apply(params["hw2"], state))
    b2 = mlp_apply(params["hb2"], state)
    hidden = jax.nn.elu(jnp.einsum("...a,...ae->...e", agent_qs, w1) + b1)
    qtot = jnp.einsum("...e,...e->...", hidden, w2) + b2[..., 0]
    return qtot


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def soft_update(target_params, online_params, polyak: float):
    """Polyak averaging θ' ← (1-τ)θ' + τθ (vdn.py:178-182; tree-map
    version vdn_jax.py:208-212)."""
    return jax.tree.map(
        lambda t, o: (1.0 - polyak) * t + polyak * o, target_params, online_params
    )


def global_norm(tree) -> chex.Array:
    """L2 norm over a gradient pytree (``norm_d``, vdn.py:172-175)."""
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves))
