"""Pallas TPU kernel for the Mamba selective scan (Caduceus backbone).

The XLA associative-scan formulation (models/caduceus.py selective_scan)
materializes the composed affine maps as TWO (B, L, D_in, N) float32 tensors
and runs ~2*log2(L) elementwise passes over them — ~8 GB of HBM traffic per
layer-direction at (8, 1024, 512, 16), measured 393 ms for the 16-layer
bidirectional model (~0.02 Mtok/s). The recurrence itself is tiny: the
(B, N, D_in) state fits in ~260 KB of VMEM.

This kernel keeps the state RESIDENT in VMEM and walks the sequence
chunk-by-chunk (the grid's minor dimension iterates sequentially on a TPU
core, so a scratch buffer carries the state across chunks), computing the
discretization exp(delta*A) per step in-registers — HBM traffic drops to
one read of u/delta/B/C and one write of y (~50 MB per layer-direction).
The recurrence is elementwise, so this is a VPU kernel; the MXU cannot help
(no contraction larger than N=16).

    h[t] = exp(delta[t] ⊗ A) ⊙ h[t-1] + (delta[t] ⊙ u[t]) ⊗ B[t]
    y[t] = Σ_n C[t,n] h[t][n,:] + D_skip ⊙ u[t]

`reverse=True` runs the scan right-to-left by reading chunks back-to-front
and iterating inside each chunk in reverse — the bidirectional ("ph"/"ps")
mixers need no jnp.flip copies around the kernel.

Differentiable via a custom VJP that recomputes through the XLA
associative-scan reference (training the Caduceus family is the rare path;
inference is what must be fast).

Reference capability: the Mamba CUDA selective-scan kernel the reference's
Caduceus checkpoints depend on (consumed via AutoModel,
deepchopper/models/llm/caduceus.py:5-55). TPU-native engineering with no
reference counterpart.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scan_kernel(
    u_ref,      # (bt, CL, D)
    dl_ref,     # (bt, CL, D)  delta (post-softplus)
    bp_ref,     # (bt, CL, N)
    cp_ref,     # (bt, CL, N)
    at_ref,     # (N, D)       A transposed
    dsk_ref,    # (1, D)       D skip
    y_ref,      # (bt, CL, D)
    h_ref,      # scratch (bt, N, D) float32 — persists across L-chunks
    *,
    chunk: int,
    reverse: bool,
):
    lc = pl.program_id(1)

    @pl.when(lc == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)

    at = at_ref[...]  # (N, D)
    dsk = dsk_ref[0]  # (D,)

    def body(i, _):
        t = (chunk - 1 - i) if reverse else i
        u_t = u_ref[:, t, :]        # (bt, D)
        d_t = dl_ref[:, t, :]       # (bt, D)
        b_t = bp_ref[:, t, :]       # (bt, N)
        c_t = cp_ref[:, t, :]       # (bt, N)
        a = jnp.exp(d_t[:, None, :] * at[None, :, :])          # (bt, N, D)
        db_u = (d_t * u_t)[:, None, :] * b_t[:, :, None]        # (bt, N, D)
        h = a * h_ref[...] + db_u
        h_ref[...] = h
        y = jnp.sum(h * c_t[:, :, None], axis=1) + dsk[None, :] * u_t  # (bt, D)
        y_ref[:, t, :] = y
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def _selective_scan_pallas_impl(
    u, delta, A, Bp, Cp, D_skip, *, chunk: int, reverse: bool, interpret: bool
):
    batch, seq_len, d_in = u.shape
    n = A.shape[1]

    pad = (-seq_len) % chunk
    if pad:
        # Padded steps only touch padded outputs in a forward scan, but a
        # REVERSE scan walks them first — make them identity steps
        # (delta=0 -> a=1... exp(0)=1, db_u=0) so the state is unaffected.
        u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, pad), (0, 0)))
        Bp = jnp.pad(Bp, ((0, 0), (0, pad), (0, 0)))
        Cp = jnp.pad(Cp, ((0, 0), (0, pad), (0, 0)))
    padded_len = seq_len + pad
    nl = padded_len // chunk

    # Batch tile: the scoped-VMEM budget must cover DOUBLE-BUFFERED blocks
    # (Mosaic prefetches the next grid step): 2x(u, delta, y) d-wide blocks
    # + 2x(B, C) n-wide blocks + the persistent h scratch, all f32. Budget
    # 12 MB of the 16 MB scoped limit (bt=16 at chunk=128, d_in=512 blew it:
    # 28.5 MB requested).
    per_bt = 2 * (3 * chunk * d_in + 2 * chunk * n) * 4 + n * d_in * 4
    bt = max(1, min(batch, (14 << 20) // per_bt))
    bt = 1 << (bt.bit_length() - 1)  # power of two: clean batch padding
    bpad = (-batch) % bt
    if bpad:
        u = jnp.pad(u, ((0, bpad), (0, 0), (0, 0)))
        delta = jnp.pad(delta, ((0, bpad), (0, 0), (0, 0)))
        Bp = jnp.pad(Bp, ((0, bpad), (0, 0), (0, 0)))
        Cp = jnp.pad(Cp, ((0, bpad), (0, 0), (0, 0)))
    nb = (batch + bpad) // bt

    if reverse:
        l_index = lambda b, l, _nl=nl: (b, _nl - 1 - l, 0)
    else:
        l_index = lambda b, l: (b, l, 0)

    d_blk = pl.BlockSpec((bt, chunk, d_in), l_index, memory_space=pltpu.VMEM)
    n_blk = pl.BlockSpec((bt, chunk, n), l_index, memory_space=pltpu.VMEM)
    at_blk = pl.BlockSpec((n, d_in), lambda b, l: (0, 0), memory_space=pltpu.VMEM)
    dsk_blk = pl.BlockSpec((1, d_in), lambda b, l: (0, 0), memory_space=pltpu.VMEM)

    y = pl.pallas_call(
        functools.partial(_scan_kernel, chunk=chunk, reverse=reverse),
        # b OUTER, l inner: the l-chunks of one batch tile run back-to-back
        # so the h scratch carries the state; a new b resets it (lc == 0).
        grid=(nb, nl),
        in_specs=[d_blk, d_blk, n_blk, n_blk, at_blk, dsk_blk],
        out_specs=d_blk,
        out_shape=jax.ShapeDtypeStruct((batch + bpad, padded_len, d_in), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, n, d_in), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * (batch + bpad) * padded_len * d_in * n,
            bytes_accessed=4 * 4 * (batch + bpad) * padded_len * d_in,
            transcendentals=(batch + bpad) * padded_len * d_in * n,
        ),
        interpret=interpret,
    )(
        u.astype(jnp.float32),
        delta.astype(jnp.float32),
        Bp.astype(jnp.float32),
        Cp.astype(jnp.float32),
        A.T.astype(jnp.float32),
        D_skip.astype(jnp.float32).reshape(1, d_in),
    )
    return y[:batch, :seq_len]


# ---------------------------------------------------------------------------
# Backward: the selective scan's VJP in VMEM.
#
# Differentiating the XLA associative-scan recompute measured 77x the
# forward on the 16-layer bidirectional model (TRAIN_PROFILE at (8, 1024):
# 1489 ms/step vs 19 ms forward) — the composed affine maps materialize as
# (B, L, D, N) f32 HBM tensors twice per layer-direction. Standard
# Mamba-style two-pass instead:
#
#   1. `_scan_ckpt_kernel`: run the recurrence once, storing ONLY the entry
#      state of every L-chunk — (B, nl, N, D), a few MB.
#   2. `_scan_bwd_kernel`: walk chunks in REVERSE. Per chunk: recompute
#      h[t] (and a[t]) forward from the checkpoint into VMEM scratch, then
#      run the cotangent recurrence backward
#          g[t] = C[t] (x) dy[t] + a[t+1] * g[t+1]
#      (the cross-chunk carry a[first]*g[first] lives in scratch, exactly
#      like the forward's h carry), emitting du, ddelta, dB, dC per step
#      and accumulating dA, dD_skip across the whole grid.
#
# For a reverse=True forward scan, time mirrors: the checkpoint pass walks
# right-to-left and the backward pass walks left-to-right.
# ---------------------------------------------------------------------------


def _scan_ckpt_kernel(u_ref, dl_ref, bp_ref, at_ref, ck_ref, h_ref, *, chunk, reverse):
    lc = pl.program_id(1)

    @pl.when(lc == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)

    ck_ref[:, 0] = h_ref[...]  # entry state of this chunk
    at = at_ref[...]

    def body(i, _):
        t = (chunk - 1 - i) if reverse else i
        d_t = dl_ref[:, t, :]
        a = jnp.exp(d_t[:, None, :] * at[None, :, :])
        db_u = (d_t * u_ref[:, t, :])[:, None, :] * bp_ref[:, t, :][:, :, None]
        h_ref[...] = a * h_ref[...] + db_u
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def _scan_bwd_kernel(
    u_ref, dl_ref, bp_ref, cp_ref, dy_ref, at_ref, dsk_ref, ck_ref,
    du_ref, ddl_ref, dbp_ref, dcp_ref, da_ref, ddsk_ref,
    g_ref, hall_ref, aall_ref,
    *, chunk, reverse,
):  # fmt: skip
    lc = pl.program_id(1)

    @pl.when(lc == 0)
    def _init_g():
        # Chronologically LAST chunk first: no future cotangent yet.
        g_ref[...] = jnp.zeros_like(g_ref)

    @pl.when((pl.program_id(0) == 0) & (lc == 0))
    def _init_acc():
        da_ref[...] = jnp.zeros_like(da_ref)
        ddsk_ref[...] = jnp.zeros_like(ddsk_ref)

    at = at_ref[...]  # (N, D)
    dsk = dsk_ref[0]  # (D,)
    h0 = ck_ref[:, 0]  # (bt, N, D) chunk entry state

    # Pass 1: recompute h[t] and a[t] within the chunk (forward order).
    def fwd_body(i, h):
        t = (chunk - 1 - i) if reverse else i
        d_t = dl_ref[:, t, :]
        a = jnp.exp(d_t[:, None, :] * at[None, :, :])
        db_u = (d_t * u_ref[:, t, :])[:, None, :] * bp_ref[:, t, :][:, :, None]
        h = a * h + db_u
        hall_ref[:, i] = h  # indexed by i (chunk-local step), not t
        aall_ref[:, i] = a
        return h

    jax.lax.fori_loop(0, chunk, fwd_body, h0)

    # Pass 2: cotangent recurrence, reverse chunk-local order.
    def bwd_body(j, g):
        i = chunk - 1 - j  # chunk-local step, last -> first
        t = (chunk - 1 - i) if reverse else i
        dy_t = dy_ref[:, t, :]  # (bt, D)
        c_t = cp_ref[:, t, :]  # (bt, N)
        u_t = u_ref[:, t, :]
        d_t = dl_ref[:, t, :]
        b_t = bp_ref[:, t, :]
        h_t = hall_ref[:, i]
        a_t = aall_ref[:, i]
        h_prev = jnp.where(i == 0, h0, hall_ref[:, jnp.maximum(i - 1, 0)])
        g = c_t[:, :, None] * dy_t[:, None, :] + g  # += direct term
        da_t = g * h_prev  # cotangent of a[t]
        # delta grads: via a (a*A) and via b (u * B)
        dd_a = jnp.sum(da_t * a_t * at[None], axis=1)  # (bt, D)
        ddu = jnp.sum(g * b_t[:, :, None], axis=1)  # (bt, D) cotangent of delta*u
        ddl_ref[:, t, :] = dd_a + ddu * u_t
        du_ref[:, t, :] = ddu * d_t + dsk[None, :] * dy_t
        dbp_ref[:, t, :] = jnp.sum(g * (d_t * u_t)[:, None, :], axis=2)  # (bt, N)
        dcp_ref[:, t, :] = jnp.sum(h_t * dy_t[:, None, :], axis=2)  # (bt, N)
        da_ref[...] += jnp.sum(da_t * a_t * d_t[:, None, :], axis=0)  # (N, D)
        ddsk_ref[...] += jnp.sum(dy_t * u_t, axis=0, keepdims=True)  # (1, D)
        return a_t * g  # carry to step t-1

    g = jax.lax.fori_loop(0, chunk, bwd_body, g_ref[...])
    g_ref[...] = g  # a[first]*g[first]: the next (earlier) chunk's carry


def selective_scan_pallas_bwd(
    u, delta, A, Bp, Cp, D_skip, dy, *, chunk: int = 128, reverse: bool = False,
    interpret: bool | None = None,
):  # fmt: skip
    """VMEM backward: returns (du, ddelta, dA, dBp, dCp, dD_skip)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, seq_len, d_in = u.shape
    n = A.shape[1]

    pad = (-seq_len) % chunk
    if pad:
        u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, pad), (0, 0)))
        Bp = jnp.pad(Bp, ((0, 0), (0, pad), (0, 0)))
        Cp = jnp.pad(Cp, ((0, 0), (0, pad), (0, 0)))
        dy = jnp.pad(dy, ((0, 0), (0, pad), (0, 0)))
    padded_len = seq_len + pad
    nl = padded_len // chunk

    per_bt = (2 * 4 * chunk * d_in + 2 * 2 * chunk * n) * 4 + 2 * chunk * n * d_in * 4 + 2 * n * d_in * 4
    bt = max(1, min(batch, (14 << 20) // per_bt))
    bt = 1 << (bt.bit_length() - 1)
    bpad = (-batch) % bt
    if bpad:
        u = jnp.pad(u, ((0, bpad), (0, 0), (0, 0)))
        delta = jnp.pad(delta, ((0, bpad), (0, 0), (0, 0)))
        Bp = jnp.pad(Bp, ((0, bpad), (0, 0), (0, 0)))
        Cp = jnp.pad(Cp, ((0, bpad), (0, 0), (0, 0)))
        dy = jnp.pad(dy, ((0, bpad), (0, 0), (0, 0)))
    nb = (batch + bpad) // bt

    args32 = [a.astype(jnp.float32) for a in (u, delta, Bp, Cp, dy)]
    at32 = A.T.astype(jnp.float32)
    dsk32 = D_skip.astype(jnp.float32).reshape(1, d_in)

    if reverse:
        fwd_l = lambda b, l, _nl=nl: (b, _nl - 1 - l, 0)  # ckpt pass walks reversed
        bwd_l = lambda b, l: (b, l, 0)  # cotangent walks forward
    else:
        fwd_l = lambda b, l: (b, l, 0)
        bwd_l = lambda b, l, _nl=nl: (b, _nl - 1 - l, 0)

    d_blk_f = pl.BlockSpec((bt, chunk, d_in), fwd_l, memory_space=pltpu.VMEM)
    n_blk_f = pl.BlockSpec((bt, chunk, n), fwd_l, memory_space=pltpu.VMEM)
    at_blk = pl.BlockSpec((n, d_in), lambda b, l: (0, 0), memory_space=pltpu.VMEM)
    dsk_blk = pl.BlockSpec((1, d_in), lambda b, l: (0, 0), memory_space=pltpu.VMEM)
    ck_blk_f = pl.BlockSpec(
        (bt, 1, n, d_in),
        (lambda b, l, _nl=nl: (b, _nl - 1 - l, 0, 0)) if reverse else (lambda b, l: (b, l, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    ckpt = pl.pallas_call(
        functools.partial(_scan_ckpt_kernel, chunk=chunk, reverse=reverse),
        grid=(nb, nl),
        in_specs=[d_blk_f, d_blk_f, n_blk_f, at_blk],
        out_specs=ck_blk_f,
        out_shape=jax.ShapeDtypeStruct((batch + bpad, nl, n, d_in), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, n, d_in), jnp.float32)],
        interpret=interpret,
    )(args32[0], args32[1], args32[2], at32)

    d_blk_b = pl.BlockSpec((bt, chunk, d_in), bwd_l, memory_space=pltpu.VMEM)
    n_blk_b = pl.BlockSpec((bt, chunk, n), bwd_l, memory_space=pltpu.VMEM)
    ck_blk_b = pl.BlockSpec(
        (bt, 1, n, d_in),
        (lambda b, l: (b, l, 0, 0)) if reverse else (lambda b, l, _nl=nl: (b, _nl - 1 - l, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    acc_a = pl.BlockSpec((n, d_in), lambda b, l: (0, 0), memory_space=pltpu.VMEM)
    acc_d = pl.BlockSpec((1, d_in), lambda b, l: (0, 0), memory_space=pltpu.VMEM)

    du, ddl, dbp, dcp, dA_t, ddsk = pl.pallas_call(
        functools.partial(_scan_bwd_kernel, chunk=chunk, reverse=reverse),
        grid=(nb, nl),
        in_specs=[d_blk_b, d_blk_b, n_blk_b, n_blk_b, d_blk_b, at_blk, dsk_blk, ck_blk_b],
        out_specs=[d_blk_b, d_blk_b, n_blk_b, n_blk_b, acc_a, acc_d],
        out_shape=[
            jax.ShapeDtypeStruct((batch + bpad, padded_len, d_in), jnp.float32),
            jax.ShapeDtypeStruct((batch + bpad, padded_len, d_in), jnp.float32),
            jax.ShapeDtypeStruct((batch + bpad, padded_len, n), jnp.float32),
            jax.ShapeDtypeStruct((batch + bpad, padded_len, n), jnp.float32),
            jax.ShapeDtypeStruct((n, d_in), jnp.float32),
            jax.ShapeDtypeStruct((1, d_in), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, n, d_in), jnp.float32),  # g carry
            pltpu.VMEM((bt, chunk, n, d_in), jnp.float32),  # h within chunk
            pltpu.VMEM((bt, chunk, n, d_in), jnp.float32),  # a within chunk
        ],
        interpret=interpret,
    )(args32[0], args32[1], args32[2], args32[3], args32[4], at32, dsk32, ckpt)

    return (
        du[:batch, :seq_len].astype(u.dtype),
        ddl[:batch, :seq_len].astype(delta.dtype),
        dA_t.T.astype(A.dtype),
        dbp[:batch, :seq_len].astype(Bp.dtype),
        dcp[:batch, :seq_len].astype(Cp.dtype),
        ddsk[0].astype(D_skip.dtype),
    )


def _scan_reference_xla(u, delta, A, Bp, Cp, D_skip, reverse):
    """The associative-scan reference (also the VJP's autodiff body)."""
    from ..models.caduceus import selective_scan

    if reverse:
        y = selective_scan(
            jnp.flip(u, 1), jnp.flip(delta, 1), A, jnp.flip(Bp, 1), jnp.flip(Cp, 1),
            D_skip, chunk=2048,
        )
        return jnp.flip(y, 1)
    return selective_scan(u, delta, A, Bp, Cp, D_skip, chunk=2048)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _scan_autodiff(u, delta, A, Bp, Cp, D_skip, chunk, reverse, interpret):
    return _selective_scan_pallas_impl(
        u, delta, A, Bp, Cp, D_skip, chunk=chunk, reverse=reverse, interpret=interpret
    )


def _scan_fwd(u, delta, A, Bp, Cp, D_skip, chunk, reverse, interpret):
    y = _selective_scan_pallas_impl(
        u, delta, A, Bp, Cp, D_skip, chunk=chunk, reverse=reverse, interpret=interpret
    )
    return y, (u, delta, A, Bp, Cp, D_skip)


def _scan_bwd(chunk, reverse, interpret, res, dy):
    import os

    if not interpret and os.environ.get("DEEPCHOPPER_SCAN_BWD", "pallas") == "pallas":
        # VMEM two-pass backward: measured orders of magnitude over
        # differentiating the associative-scan recompute (docs/performance.md).
        u, delta, A, Bp, Cp, D_skip = res
        return selective_scan_pallas_bwd(
            u, delta, A, Bp, Cp, D_skip, dy, chunk=chunk, reverse=reverse, interpret=interpret
        )
    _, vjp = jax.vjp(lambda *a: _scan_reference_xla(*a, reverse), *res)
    return vjp(dy)


_scan_autodiff.defvjp(_scan_fwd, _scan_bwd)


def selective_scan_pallas(
    u: jnp.ndarray,
    delta: jnp.ndarray,
    A: jnp.ndarray,
    Bp: jnp.ndarray,
    Cp: jnp.ndarray,
    D_skip: jnp.ndarray,
    *,
    chunk: int = 128,
    reverse: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """VMEM-resident selective scan; same contract as
    models.caduceus.selective_scan (plus `reverse`). Returns (B, L, D_in)
    float32. Differentiable (custom VJP via the XLA reference)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _scan_autodiff(u, delta, A, Bp, Cp, D_skip, chunk, reverse, interpret)
