"""Fused Pallas GRU sequence kernel (TPU) with custom VJP.

Why this exists: the training-time GRU recompute over a rollout is a
``lax.scan`` whose body XLA lowers to ~8-10 small kernels per step
(recurrent matmul, gate splits, sigmoid/tanh, carry select, scan
bookkeeping). Profiling the north-star bench block
(validation/profile_r3, round 3) shows ~89% of wall time spent in ~141k
such ~10µs fusions — the sequential scan is kernel-overhead bound, not
MXU bound. This kernel runs the ENTIRE time loop for one batch tile
inside a single Pallas program: the hidden state lives in VMEM scratch
across grid steps, the per-step input projections ``gi`` stream
HBM→VMEM through Pallas's pipelined BlockSpecs, and each step is one
(TM,H)x(H,3H) MXU matmul plus VPU gating.

Semantics match ``networks.rnn_seq_apply``'s scan exactly (torch
nn.GRUCell gate order r,z,n; reset gate applied to the projected hidden
contribution; the carry is zeroed AFTER emitting step t's output
wherever the keep-mask is 0):

    gh = h @ wh + bh
    r = σ(gi_r + gh_r); z = σ(gi_z + gh_z); n = tanh(gi_n + r·gh_n)
    h2 = (1−z)·n + z·h ;  emitted.  carry ← keep·h2

The backward recomputes the gates from (gi, h_prev) — one extra matmul
per step instead of materializing (T, M, 3H) gate residuals — and
accumulates dwh/dbh in VMEM across the whole sequence.

Shapes: gi (T, M, 3H), h0 (M, H), keep (T, M, 1) f32 ∈ {0,1} (trailing
singleton keeps the block TPU-tileable); → (h_final (M, H),
h_seq (T, M, H)). M is tiled by ``TM``; callers pad M to a multiple of
8 (f32 sublane).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tm(m: int, three_h: int = 384) -> int:
    """Batch-tile size: cap VMEM use, keep sublane alignment.

    The kernel keeps several (TM, 3H) blocks resident (gi in, dgi out,
    plus h/grad blocks), so the tile must SHRINK as the gate width
    grows — a fixed 1024 overflows VMEM at hidden ≥256 (compile
    failure, round-4 wide-hidden sweep). Budget ~2MB per (TM, 3H)
    operand; at the bench width (3H=384) this still selects 1024."""
    cap = max(8, (2 * 2 ** 20) // (three_h * 4))
    for cand in (1024, 512, 256, 128, 64, 32, 16, 8):
        if cand <= cap and m % cand == 0:
            return min(cand, m)
    raise ValueError(f"M={m} must be a multiple of 8")


def _gates(gi_t, gh, H: int):
    r = jax.nn.sigmoid(gi_t[:, 0:H] + gh[:, 0:H])
    z = jax.nn.sigmoid(gi_t[:, H:2 * H] + gh[:, H:2 * H])
    n = jnp.tanh(gi_t[:, 2 * H:] + r * gh[:, 2 * H:])
    return r, z, n


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(wh_ref, bh_ref, h0_ref, gi_ref, keep_ref,
                hseq_ref, hfinal_ref, h_scr):
    t = pl.program_id(1)
    H = h0_ref.shape[-1]

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    gh = jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32) + bh_ref[:]
    r, z, n = _gates(gi_ref[0], gh, H)
    h2 = (1.0 - z) * n + z * h
    hseq_ref[0] = h2
    h_scr[:] = keep_ref[0] * h2          # keep block (TM, 1) broadcasts

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        hfinal_ref[:] = h_scr[:]


def _fwd(wh, bh, h0, gi, keep):
    T, M, threeH = gi.shape
    H = threeH // 3
    TM = _tm(M, threeH)
    n_m = M // TM
    grid = (n_m, T)
    kernel = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((H, threeH), lambda m, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, threeH), lambda m, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, H), lambda m, t: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, threeH), lambda m, t: (t, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, 1), lambda m, t: (t, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TM, H), lambda m, t: (t, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, H), lambda m, t: (m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, M, H), jnp.float32),
            jax.ShapeDtypeStruct((M, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((TM, H), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )
    h_seq, h_final = kernel(wh, bh.reshape(1, threeH), h0, gi, keep)
    return h_final, h_seq


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _make_bwd_kernel():
    def kernel(wh_ref, bh_ref, h0_ref, hseq_prev_ref, gi_ref, keep_ref,
               keep_prev_ref, ghseq_ref, ghfin_ref,
               dgi_ref, dwh_ref, dbh_ref, dh0_ref, dh_scr):
        t = pl.program_id(1)
        H = h0_ref.shape[-1]
        first = t == 0
        last = t == pl.num_programs(1) - 1
        m_first = pl.program_id(0) == 0

        @pl.when(first)
        def _():
            dh_scr[:] = ghfin_ref[:]

        @pl.when(jnp.logical_and(first, m_first))
        def _():
            dwh_ref[:] = jnp.zeros_like(dwh_ref)
            dbh_ref[:] = jnp.zeros_like(dbh_ref)

        # h entering this step: keep[s-1]·h_seq[s-1] for s>0 (h_seq is
        # the saved PRE-mask forward output, streamed here at the
        # shifted index — no (T, M, H) h_prev materialization on the
        # host side), h0 on the last reverse iteration (s == 0)
        h_prev = jnp.where(
            last, h0_ref[:], keep_prev_ref[0] * hseq_prev_ref[0]
        )
        gi_t = gi_ref[0]
        wh = wh_ref[:]
        gh = jnp.dot(h_prev, wh,
                     preferred_element_type=jnp.float32) + bh_ref[:]
        r, z, n = _gates(gi_t, gh, H)

        # dh2 = upstream output grad + carry grad gated by this step's keep
        dh2 = ghseq_ref[0] + keep_ref[0] * dh_scr[:]
        dz = dh2 * (h_prev - n)
        dn = dh2 * (1.0 - z)
        da_n = dn * (1.0 - n * n)
        hn = gh[:, 2 * H:]
        dr = da_n * hn
        da_r = dr * r * (1.0 - r)
        da_z = dz * z * (1.0 - z)
        dgh = jnp.concatenate([da_r, da_z, da_n * r], axis=-1)
        dgi_ref[0] = jnp.concatenate([da_r, da_z, da_n], axis=-1)
        dwh_ref[:] += jnp.dot(h_prev.T, dgh,
                              preferred_element_type=jnp.float32)
        dbh_ref[:] += jnp.sum(dgh, axis=0, keepdims=True)
        dh_scr[:] = (
            dh2 * z
            + jnp.dot(dgh, wh.T, preferred_element_type=jnp.float32)
        )

        @pl.when(t == pl.num_programs(1) - 1)
        def _():
            dh0_ref[:] = dh_scr[:]

    return kernel


def _bwd_call(wh, bh, h0, h_seq, gi, keep, g_hseq, g_hfinal):
    T, M, threeH = gi.shape
    H = threeH // 3
    TM = _tm(M, threeH)
    n_m = M // TM
    rev = lambda m, t: (T - 1 - t, m, 0)        # noqa: E731
    # step s-1 of the saved sequences; clamped to 0 on the last reverse
    # iteration, where the kernel reads h0 instead
    rev_prev = lambda m, t: (jnp.maximum(T - 2 - t, 0), m, 0)  # noqa: E731
    kernel = pl.pallas_call(
        _make_bwd_kernel(),
        grid=(n_m, T),
        in_specs=[
            pl.BlockSpec((H, threeH), lambda m, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, threeH), lambda m, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, H), lambda m, t: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, H), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, threeH), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, 1), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, H), lambda m, t: (m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TM, threeH), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, threeH), lambda m, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, threeH), lambda m, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, H), lambda m, t: (m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, M, threeH), jnp.float32),
            jax.ShapeDtypeStruct((H, threeH), jnp.float32),
            jax.ShapeDtypeStruct((1, threeH), jnp.float32),
            jax.ShapeDtypeStruct((M, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((TM, H), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )
    return kernel(wh, bh.reshape(1, threeH), h0, h_seq, gi, keep,
                  keep, g_hseq, g_hfinal)


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

@jax.custom_vjp
def gru_seq(wh, bh, h0, gi, keep):
    """Fused GRU over time. gi (T, M, 3H), h0 (M, H), keep (T, M, 1)
    f32. → (h_final (M, H), h_seq (T, M, H)); h_seq[t] is the PRE-mask
    output, the carry into t+1 is keep[t]·h_seq[t]."""
    return _fwd(wh, bh, h0, gi, keep)


def _gru_seq_fwd(wh, bh, h0, gi, keep):
    h_final, h_seq = _fwd(wh, bh, h0, gi, keep)
    return (h_final, h_seq), (wh, bh, h0, gi, keep, h_seq)


def _gru_seq_bwd(res, cts):
    wh, bh, h0, gi, keep, h_seq = res
    g_hfinal, g_hseq = cts
    g_hfinal = jnp.zeros_like(h0) if g_hfinal is None else g_hfinal
    g_hseq = jnp.zeros_like(h_seq) if g_hseq is None else g_hseq
    # h_prev at step t = keep[t-1]·h_seq[t-1] (h0 at t=0) is formed
    # INSIDE the kernel from the saved h_seq at a shifted block index —
    # no (T, M, H) h_prev materialization pass
    dgi, dwh, dbh, dh0 = _bwd_call(
        wh, bh, h0, h_seq, gi, keep, g_hseq, g_hfinal
    )
    return dwh, dbh.reshape(bh.shape), dh0, dgi, jnp.zeros_like(keep)


gru_seq.defvjp(_gru_seq_fwd, _gru_seq_bwd)
