"""Fused grouped-vector-attention core (PT-v2) for TPU.

Replaces the XLA composition of the GVA block's neighbour math
(reference: point_transformer_v2m2_base.py:48-126 — the PE MLP, relation,
weight encoding, masked softmax and grouped aggregation) with Pallas
kernels that keep every (B, N, S, *) intermediate in VMEM. The XLA
lowering materialises each of those tensors in HBM with tile-padded
layouts (e.g. the (…, groups=6) weight tensors pad 6 -> 128 lanes), which
makes the chain memory-bound; the fused kernels read the gathered
neighbour rows once per pass and write only (B, N, C)-sized outputs.

Semantics match the unfused path exactly:

* pe MLP: Dense(3->C) -> masked BN -> ReLU -> Dense(C->C). The BN batch
  statistics of a *linear* map follow analytically from the first two
  moments of the relative positions (mean = E[pos] W + b,
  var_c = w_c^T Cov(pos) w_c), so BN folds into one affine map
  ``pos @ A + cA`` with exact statistics.
* weight MLP: Dense(C->G) -> masked BN -> ReLU -> Dense(G->G). Its BN
  statistics take one extra cheap pass (pass 1) accumulating
  sum / sum-of-squares of Dense1(relation) over valid slots.
* masked softmax over the S neighbour slots (shifted by the tile max —
  softmax is shift-invariant, so a shared shift is exact).
* out[n, g*K+i] = sum_s (v_g + peb)[n,s,g*K+i] * softmax_w[n,s,g].

The backward pass is hand-written: the main kernel recomputes the
forward in VMEM and emits d(kv rows), d(q) and parameter gradients; a
second kernel routes the weight-BN statistics' gradient (the d_mean /
d_var terms that torch BatchNorm backward includes) back through
Dense1(relation).

Relative positions are not materialised in HBM: absolute coordinates
ride the neighbour gather as two bf16 channels per axis (hi+lo split,
~2^-16 relative error) and kernels reconstruct
``rel = (khi+klo) - (qhi+qlo)`` in f32. (The XLA (B, N*S, 3) f32 array
was tile-padded 3 -> 128 lanes in HBM — 42x its logical size.)

Row layouts (all in-kernel tensors 2D; per-query segment reductions /
broadcasts over S slots are MXU matmuls with 0/1 matrices from iota):
  kv rows  (TQ*S, 2C+6) bf16: [k | v | key hi3 | key lo3]
  valid    (TQ, S)      bf16 slot-validity (expanded to rows by matmul)
  q rows   (TQ,  C+7)   bf16: [q | query hi3 | query lo3 | row mask]
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

_EPS = 1e-5  # PointBatchNorm eps (models/utils.py)


# ---------------------------------------------------------------------------
# packing helpers (host side)
# ---------------------------------------------------------------------------


def pack_coords(coord):
    """(…, 3) f32 -> (…, 6) bf16 [hi | lo] with hi+lo ~= coord."""
    hi = coord.astype(jnp.bfloat16)
    lo = (coord - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=-1)


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------


# Segment matmuls run at the MXU's default bf16 mantissa: values round to
# bf16 but accumulate in f32, which is the same noise floor as the bf16
# activations everywhere else. (HIGHEST precision costs 6 MXU passes and
# only mattered for d(b2) — a gradient that is exactly zero by softmax
# shift-invariance and functionally irrelevant.)
def _mm(a, b):  # a @ b
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _mtm(a, b):  # a.T @ b without materialising the transpose
    return lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _mmt(a, b):  # a @ b.T
    return lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _mm_bf16(a, b):
    # genuine bf16 compute (matches the unfused Dense(dtype=bf16) layers)
    return lax.dot_general(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                           (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _mmt_bf16(a, b):  # a @ b.T in bf16 (Mosaic rejects fp32 precision here)
    return lax.dot_general(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                           (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _seg_matrix(tq, s):
    """M (tq*s, tq): 1 iff slot row r belongs to query r // s."""
    rows = lax.broadcasted_iota(jnp.int32, (tq * s, tq), 0)
    cols = lax.broadcasted_iota(jnp.int32, (tq * s, tq), 1)
    return ((rows // s) == cols).astype(jnp.float32)


def _expand_matrix(g, c):
    """E (g, c): 1 iff lane c' belongs to group c' // (c//g)."""
    k = c // g
    rows = lax.broadcasted_iota(jnp.int32, (g, c), 0)
    cols = lax.broadcasted_iota(jnp.int32, (g, c), 1)
    return ((cols // k) == rows).astype(jnp.float32)


def _expand_valid(vts, tq, s):
    """(TQ, S) validity -> per-slot-row column (TQ*S, 1) without reshapes:
    row r takes lane r %% s of query row r // s."""
    M = _seg_matrix(tq, s)
    # bf16 matmul is exact here: M is one-hot, vts is 0/1
    tmp = _mm_bf16(M, vts)  # (TQ*S, S)
    sel = (
        lax.broadcasted_iota(jnp.int32, (tq * s, s), 0) % s
        == lax.broadcasted_iota(jnp.int32, (tq * s, s), 1)
    ).astype(jnp.float32)
    return jnp.sum(tmp * sel, axis=1, keepdims=True)


def _pad_lanes(x, width):
    if x.shape[1] == width:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((x.shape[0], width - x.shape[1]), x.dtype)], axis=1
    )


def _recompute(kvp, qrow, valid_ts, A, cA, Wp2, bp2, W1x, b1x,
                *, C, S, TQ, lanes=None):
    """Shared slot-level recompute up to t = Dense1x(relation).

    W1x/b1x are the folded (pass 2 / bwd 1) or raw (pass 1 / bwd 2)
    weight-MLP first layer. Returns a dict of live intermediates.

    ``lanes`` = (v_off, pos_off) overrides the default [k|v|pos6] row
    layout; v_off=None marks a narrow row with no value lanes (the
    stats passes don't consume v2)."""
    v_off, pos_off = lanes if lanes is not None else (C, 2 * C)
    k_g = kvp[:, :C].astype(jnp.float32)
    v_g = (
        kvp[:, v_off:v_off + C].astype(jnp.float32)
        if v_off is not None else None
    )
    pos = (
        kvp[:, pos_off:pos_off + 3].astype(jnp.float32)
        + kvp[:, pos_off + 3:pos_off + 6].astype(jnp.float32)
    )
    valid = _expand_valid(valid_ts, TQ, S)  # (TQ*S, 1)
    mrow = qrow[:, C + 6:C + 7].astype(jnp.float32)  # (TQ, 1)

    M = _seg_matrix(TQ, S)
    # per-slot broadcast of the query rows via one-hot matmuls — exact in
    # bf16 (M is 0/1, the qrow lanes are bf16 payloads; summing the
    # broadcast hi/lo coordinate halves in f32 preserves the packed-f32
    # coordinate trick)
    pos_qs = (
        _mm_bf16(M, qrow[:, C:C + 3])
        + _mm_bf16(M, qrow[:, C + 3:C + 6])
    )
    pos = (pos - pos_qs) * valid
    # pe MLP, BN folded to affine (exact: the BN input is linear in pos)
    pe0 = (_mm_bf16(pos, A) + cA) * valid
    pe1 = jnp.maximum(pe0, 0.0)
    peb = _mm_bf16(pe1, Wp2) + bp2

    r = k_g - _mm_bf16(M, qrow[:, :C]) + peb
    v2 = v_g + peb if v_g is not None else None
    t = (_mm_bf16(r, W1x) + b1x) * valid
    return dict(pos=pos, valid=valid, mrow=mrow, M=M, pe0=pe0, pe1=pe1,
                peb=peb, r=r, v2=v2, t=t)


def _softmax(w, valid, M):
    # Mask BEFORE the exp: a fully-padded tile (no valid slot anywhere —
    # common at the tail of real scenes) would otherwise give
    # mx = -1e30 -> exp(w - mx) = inf -> inf * 0 = NaN.
    wm = jnp.where(valid > 0, w, -1e30)
    mx = jnp.max(wm)
    z = jnp.exp(jnp.maximum(wm - mx, -80.0)) * valid
    Z = _mtm(M, z)  # (TQ, G)
    return z / jnp.maximum(_mm(M, Z), 1e-30)


def _peb_bwd(env, dpeb, Wp2):
    """Backward through the pe MLP given d(peb). Returns dpe0 and the
    (dWp2, dbp2, dA, dcA) partials of this tile."""
    dpe1 = _mmt_bf16(dpeb, Wp2)
    dpe0 = jnp.where(env["pe0"] > 0, dpe1, 0.0) * env["valid"]
    dWp2 = _mtm(env["pe1"], dpeb)
    dbp2 = jnp.sum(dpeb, axis=0, keepdims=True)
    dA = _mtm(env["pos"], dpe0)
    dcA = jnp.sum(dpe0, axis=0, keepdims=True)
    return dpe0, dWp2, dbp2, dA, dcA


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _stats_kernel(kvp_ref, qrow_ref, valid_ref, A_ref, cA_ref, Wp2_ref,
                  bp2_ref, W1_ref, b1_ref, sums_ref, *, C, S, G, TQ):
    b = pl.program_id(0)
    t = pl.program_id(1)
    env = _recompute(
        kvp_ref[0], qrow_ref[0], valid_ref[0], A_ref[...], cA_ref[...],
        Wp2_ref[...], bp2_ref[...], W1_ref[...], b1_ref[...],
        C=C, S=S, TQ=TQ,
    )

    @pl.when((b == 0) & (t == 0))
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    t1, valid, pos = env["t"], env["valid"], env["pos"]
    W = sums_ref.shape[1]
    st = _pad_lanes(jnp.sum(t1 * valid, axis=0, keepdims=True), W)
    st2 = _pad_lanes(jnp.sum(t1 * t1 * valid, axis=0, keepdims=True), W)
    cnt = _pad_lanes(jnp.sum(valid, axis=0, keepdims=True), W)
    sp = _pad_lanes(jnp.sum(pos, axis=0, keepdims=True), W)  # pos pre-zeroed
    pp = _pad_lanes(_mtm(pos, pos), W)  # (3, W)
    sums_ref[...] += jnp.concatenate([st, st2, cnt, sp, pp], axis=0)


def _pos_kernel(kvp_ref, qrow_ref, valid_ref, sums_ref, *, C, S, G, TQ):
    """Accumulate the relative-position moments (sum rel (3,), sum
    rel rel^T (3,3), valid count) straight from the packed coordinate
    lanes of the gathered rows. Computing these in XLA needs a second
    (B,N,S,3) f32 gather (or lane-sliced temps) that tile-pads 3 -> 128
    in HBM; here it is one extra streaming pass over rows the other
    kernels read anyway."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    kvp = kvp_ref[0]
    qrow = qrow_ref[0]
    pos = (
        kvp[:, 2 * C:2 * C + 3].astype(jnp.float32)
        + kvp[:, 2 * C + 3:2 * C + 6].astype(jnp.float32)
    )
    valid = _expand_valid(valid_ref[0], TQ, S)
    M = _seg_matrix(TQ, S)
    pos_qs = (
        _mm_bf16(M, qrow[:, C:C + 3])
        + _mm_bf16(M, qrow[:, C + 3:C + 6])
    )  # exact: one-hot M, bf16 hi/lo lanes
    pos = (pos - pos_qs) * valid

    @pl.when((b == 0) & (t == 0))
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    W = sums_ref.shape[1]
    sp = _pad_lanes(jnp.sum(pos, axis=0, keepdims=True), W)
    pp = _pad_lanes(_mtm(pos, pos), W)
    cnt = _pad_lanes(jnp.sum(valid, axis=0, keepdims=True), W)
    sums_ref[...] += jnp.concatenate([sp, pp, cnt], axis=0)


def _fwd_kernel(kvp_ref, qrow_ref, valid_ref, A_ref, cA_ref, Wp2_ref,
                bp2_ref, W1f_ref, b1f_ref, W2_ref, b2_ref, out_ref,
                *, C, S, G, TQ):
    env = _recompute(
        kvp_ref[0], qrow_ref[0], valid_ref[0], A_ref[...], cA_ref[...],
        Wp2_ref[...], bp2_ref[...], W1f_ref[...], b1f_ref[...],
        C=C, S=S, TQ=TQ,
    )
    u = jnp.maximum(env["t"], 0.0)
    w = _mm(u, W2_ref[...]) + b2_ref[...]
    sm = _softmax(w, env["valid"], env["M"])
    E = _expand_matrix(G, C)
    contrib = env["v2"] * _mm(sm, E)
    out_ref[0] = (_mtm(env["M"], contrib) * env["mrow"]).astype(out_ref.dtype)


def _bwd_kernel(kvp_ref, qrow_ref, valid_ref, A_ref, cA_ref, Wp2_ref,
                bp2_ref, W1f_ref, b1f_ref, W2_ref, b2_ref, dout_ref,
                dkv_ref, dq_ref, dpar_ref, *, C, S, G, TQ):
    b = pl.program_id(0)
    t = pl.program_id(1)
    env = _recompute(
        kvp_ref[0], qrow_ref[0], valid_ref[0], A_ref[...], cA_ref[...],
        Wp2_ref[...], bp2_ref[...], W1f_ref[...], b1f_ref[...],
        C=C, S=S, TQ=TQ,
    )
    M, valid = env["M"], env["valid"]
    u = jnp.maximum(env["t"], 0.0)
    W2 = W2_ref[...]
    w = _mm(u, W2) + b2_ref[...]
    sm = _softmax(w, valid, M)
    E = _expand_matrix(G, C)
    sme = _mm(sm, E)

    dout = dout_ref[0].astype(jnp.float32) * env["mrow"]
    dout_r = _mm(M, dout)  # per-slot copy of the query's dout
    dv2 = sme * dout_r
    dsm = _mmt(env["v2"] * dout_r, E)
    dw = sm * (dsm - _mm(M, _mtm(M, sm * dsm)))
    du = _mmt(dw, W2)
    dt = jnp.where(env["t"] > 0, du, 0.0) * valid
    W1f = W1f_ref[...]
    dr = _mmt_bf16(dt, W1f)
    dpeb = dr + dv2
    dpe0, dWp2, dbp2, dA, dcA = _peb_bwd(env, dpeb, Wp2_ref[...])

    pad = jnp.zeros((TQ * S, kvp_ref.shape[2] - 2 * C), jnp.float32)
    dkv_ref[0] = jnp.concatenate([dr, dv2, pad], axis=1).astype(dkv_ref.dtype)
    dq_ref[0] = (-_mtm(M, dr)).astype(dq_ref.dtype)

    @pl.when((b == 0) & (t == 0))
    def _():
        dpar_ref[...] = jnp.zeros_like(dpar_ref)

    W = dpar_ref.shape[1]
    dpar_ref[...] += jnp.concatenate(
        [
            _pad_lanes(_mtm(env["r"], dt), W),                     # dW1f (C)
            _pad_lanes(jnp.sum(dt, axis=0, keepdims=True), W),     # db1f (1)
            _pad_lanes(_mtm(u, dw), W),                            # dW2 (G)
            _pad_lanes(jnp.sum(dw, axis=0, keepdims=True), W),     # db2 (1)
            _pad_lanes(dWp2, W),                                   # (C)
            _pad_lanes(dbp2, W),                                   # (1)
            _pad_lanes(dA, W),                                     # (3)
            _pad_lanes(dcA, W),                                    # (1)
        ],
        axis=0,
    )


def _bwd_stats_kernel(kvp_ref, qrow_ref, valid_ref, A_ref, cA_ref,
                      Wp2_ref, bp2_ref, W1_ref, b1_ref, coef_ref,
                      dkv_in_ref, dq_in_ref, dkv_ref, dq_ref, dpar_ref,
                      *, C, S, G, TQ):
    """Second backward pass (weight-BN statistics' gradient). dkv_in/dq_in
    are the MAIN backward kernel's outputs, aliased to this kernel's
    dkv/dq outputs — the pass accumulates in place instead of
    materialising a second full (B, N*S, 2C+6) array that XLA then adds
    (two extra HBM round-trips of the widest tensor in the model)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    env = _recompute(
        kvp_ref[0], qrow_ref[0], valid_ref[0], A_ref[...], cA_ref[...],
        Wp2_ref[...], bp2_ref[...], W1_ref[...], b1_ref[...],
        C=C, S=S, TQ=TQ,
    )
    valid, M = env["valid"], env["M"]
    # dt1 = c0 + c1 * t1 per valid slot (see _gva_bwd: the mean/var path)
    c0 = coef_ref[0:1, :G]
    c1 = coef_ref[1:2, :G]
    dt1 = (c0 + env["t"] * c1) * valid
    W1 = W1_ref[...]
    dr = _mmt_bf16(dt1, W1)
    dpe0, dWp2, dbp2, dA, dcA = _peb_bwd(env, dr, Wp2_ref[...])

    pad = jnp.zeros((TQ * S, kvp_ref.shape[2] - C), jnp.float32)
    delta = jnp.concatenate([dr, pad], axis=1)
    dkv_ref[0] = (
        dkv_in_ref[0].astype(jnp.float32) + delta
    ).astype(dkv_ref.dtype)
    dq_ref[0] = dq_in_ref[0] - _mtm(M, dr)

    @pl.when((b == 0) & (t == 0))
    def _():
        dpar_ref[...] = jnp.zeros_like(dpar_ref)

    W = dpar_ref.shape[1]
    dpar_ref[...] += jnp.concatenate(
        [
            _pad_lanes(_mtm(env["r"], dt1), W),                    # dW1 (C)
            _pad_lanes(jnp.sum(dt1, axis=0, keepdims=True), W),    # db1 (1)
            _pad_lanes(dWp2, W),
            _pad_lanes(dbp2, W),
            _pad_lanes(dA, W),
            _pad_lanes(dcA, W),
        ],
        axis=0,
    )


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _specs(S, C, TQ, row_w, q_w):
    kvp = pl.BlockSpec((1, TQ * S, row_w), lambda b, t: (b, t, 0))
    qrow = pl.BlockSpec((1, TQ, q_w), lambda b, t: (b, t, 0))
    vspec = pl.BlockSpec((1, TQ, S), lambda b, t: (b, t, 0))

    def const(shape):
        return pl.BlockSpec(shape, lambda b, t: tuple(0 for _ in shape))

    outn = pl.BlockSpec((1, TQ, C), lambda b, t: (b, t, 0))
    return kvp, qrow, vspec, const, outn


def _stats_w(C, G):
    return 128 * -(-max(C, G) // 128)


def _run(kernel, grid, in_specs, out_specs, out_shape, args, interpret,
         io_aliases=None, **kw):
    out = pl.pallas_call(
        functools.partial(kernel, **kw),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        input_output_aliases=io_aliases or {},
    )(*args)
    return out


_N_PAR_MAIN = lambda C, G: C + 1 + G + 1 + C + 1 + 3 + 1  # noqa: E731
_N_PAR_STATS = lambda C: C + 1 + C + 1 + 3 + 1  # noqa: E731


# ---------------------------------------------------------------------------
# custom-vjp core
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15))
def gva_core(kvp, qrow, valid, Wp1, bp1, gp, bp, Wp2, bp2, wparams,
             pos_moments, S, C, G, TQ, interpret=False):
    """Fused GVA neighbour math (train mode: BN batch statistics).

    kvp (B, N*S, 2C+6) bf16; qrow (B, N, C+7) bf16; valid (B, N, S) bf16;
    wparams = (W1, b1, gw, bw, W2, b2);
    pos_moments = (sum pos (3,), sum pos pos^T (3,3), count) over valid
    slots — non-differentiable (coordinates carry no parameter gradient).
    Returns (out (B,N,C) f32, (weight-BN mean, biased var, count),
    (pe-BN mean, biased var)).
    """
    out, _, stats = _fwd_inner(kvp, qrow, valid, Wp1, bp1, gp, bp, Wp2, bp2,
                               wparams, pos_moments, S, C, G, TQ, interpret)
    return (out,) + stats


def _fold_pe(Wp1, bp1, gp, bp, pos_moments):
    psum, ppsum, pn = pos_moments
    n = jnp.maximum(pn, 1.0)
    pmean = psum / n
    pcov = ppsum / n - pmean[:, None] * pmean[None, :]
    mu_p = pmean @ Wp1 + bp1
    var_p = jnp.maximum(jnp.einsum("ic,ij,jc->c", Wp1, pcov, Wp1), 0.0)
    inv_p = lax.rsqrt(var_p + _EPS)
    A = Wp1 * (gp * inv_p)[None, :]
    cA = (bp1 - mu_p) * gp * inv_p + bp
    return A, cA, mu_p, var_p, pmean, pcov


def _fold_pe_running(Wp1, bp1, gp, bp, mu_p, var_p):
    inv_p = lax.rsqrt(var_p + _EPS)
    A = Wp1 * (gp * inv_p)[None, :]
    cA = (bp1 - mu_p) * gp * inv_p + bp
    return A, cA


def _fold_w(W1, b1, gw, bw, mu_w, var_w):
    inv_w = lax.rsqrt(var_w + _EPS)
    sw = gw * inv_w
    cw = bw - mu_w * sw
    return W1 * sw[None, :], b1 * sw + cw, sw, inv_w


def compute_pos_moments(kvp, qrow, valid, S, C, G, TQ, interpret=False):
    """Run only the position-moments pass. The moments depend solely on
    (coordinates, neighbour graph), which every block of a stage shares —
    callers compute them once per stage and feed them to each block's
    gva_core instead of paying the pass per block."""
    # moments are non-differentiable (coordinates + graph only); without
    # this the raw pallas_call would be caught by jvp tracing when called
    # outside gva_core's custom_vjp
    kvp, qrow, valid = jax.tree_util.tree_map(
        lax.stop_gradient, (kvp, qrow, valid)
    )
    B, NS, row_w = kvp.shape
    N = NS // S
    q_w = qrow.shape[-1]
    grid = (B, N // TQ)
    kvp_s, qrow_s, vspec, const, outn = _specs(S, C, TQ, row_w, q_w)
    SW = _stats_w(C, G)
    psums = _run(
        _pos_kernel, grid,
        [kvp_s, qrow_s, vspec],
        pl.BlockSpec((5, SW), lambda b, t: (0, 0)),
        jax.ShapeDtypeStruct((5, SW), jnp.float32),
        (kvp, qrow, valid),
        interpret, C=C, S=S, G=G, TQ=TQ,
    )
    psums = lax.optimization_barrier(psums)
    return jax.tree_util.tree_map(
        lax.stop_gradient, (psums[0, :3], psums[1:4, :3], psums[4, 0])
    )


def _fwd_inner(kvp, qrow, valid, Wp1, bp1, gp, bp, Wp2, bp2, wparams,
               pos_moments, S, C, G, TQ, interpret):
    W1, b1, gw, bw, W2, b2 = wparams
    B, NS, row_w = kvp.shape
    N = NS // S
    q_w = qrow.shape[-1]
    grid = (B, N // TQ)
    kvp_s, qrow_s, vspec, const, outn = _specs(S, C, TQ, row_w, q_w)
    SW = _stats_w(C, G)

    if pos_moments is None:
        pos_moments = compute_pos_moments(
            kvp, qrow, valid, S, C, G, TQ, interpret
        )
    pos_moments = jax.tree_util.tree_map(lax.stop_gradient, pos_moments)

    A, cA, mu_p, var_p, _, _ = _fold_pe(Wp1, bp1, gp, bp, pos_moments)
    sums = _run(
        _stats_kernel, grid,
        [kvp_s, qrow_s, vspec, const(A.shape), const((1, C)),
         const(Wp2.shape), const((1, C)), const(W1.shape), const((1, G))],
        pl.BlockSpec((7, SW), lambda b, t: (0, 0)),
        jax.ShapeDtypeStruct((7, SW), jnp.float32),
        (kvp, qrow, valid, A, cA[None], Wp2, bp2[None], W1, b1[None]),
        interpret, C=C, S=S, G=G, TQ=TQ,
    )
    sums = lax.optimization_barrier(sums)
    n = jnp.maximum(sums[2, 0], 1.0)
    mu_w = sums[0, :G] / n
    var_w = jnp.maximum(sums[1, :G] / n - mu_w * mu_w, 0.0)
    W1f, b1f, _, _ = _fold_w(W1, b1, gw, bw, mu_w, var_w)
    out = _run(
        _fwd_kernel, grid,
        [kvp_s, qrow_s, vspec, const(A.shape), const((1, C)),
         const(Wp2.shape), const((1, C)), const(W1f.shape), const((1, G)),
         const(W2.shape), const((1, G))],
        outn,
        jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        (kvp, qrow, valid, A, cA[None], Wp2, bp2[None], W1f, b1f[None], W2,
         b2[None]),
        interpret, C=C, S=S, G=G, TQ=TQ,
    )
    out = lax.optimization_barrier(out)
    res = (kvp, qrow, valid, Wp1, bp1, gp, bp, Wp2, bp2, wparams,
           pos_moments, mu_w, var_w, n)
    return out, res, ((mu_w, var_w, n), (mu_p, var_p, pos_moments[2]))


def gva_core_eval(kvp, qrow, valid, Wp1, bp1, gp, bp, Wp2, bp2, wparams,
                  running_p, running_w, S, C, G, TQ, interpret=False):
    """Inference-mode fused GVA: both BNs use running statistics (no stats
    pass). Not differentiable — evaluation only."""
    W1, b1, gw, bw, W2, b2 = wparams
    B, NS, row_w = kvp.shape
    N = NS // S
    q_w = qrow.shape[-1]
    grid = (B, N // TQ)
    kvp_s, qrow_s, vspec, const, outn = _specs(S, C, TQ, row_w, q_w)
    A, cA = _fold_pe_running(Wp1, bp1, gp, bp, *running_p)
    W1f, b1f, _, _ = _fold_w(W1, b1, gw, bw, *running_w)
    out = _run(
        _fwd_kernel, grid,
        [kvp_s, qrow_s, vspec, const(A.shape), const((1, C)),
         const(Wp2.shape), const((1, C)), const(W1f.shape), const((1, G)),
         const(W2.shape), const((1, G))],
        outn,
        jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        (kvp, qrow, valid, A, cA[None], Wp2, bp2[None], W1f, b1f[None], W2,
         b2[None]),
        interpret, C=C, S=S, G=G, TQ=TQ,
    )
    return lax.optimization_barrier(out)


def _fwd_vjp(kvp, qrow, valid, Wp1, bp1, gp, bp, Wp2, bp2, wparams,
             pos_moments, S, C, G, TQ, interpret):
    out, res, stats = _fwd_inner(kvp, qrow, valid, Wp1, bp1, gp, bp, Wp2,
                                 bp2, wparams, pos_moments, S, C, G, TQ,
                                 interpret)
    return (out,) + stats, res


def _bwd_vjp(S, C, G, TQ, interpret, res, cts):
    dout, dstats_w, _dstats_p = cts
    d_mu_in, d_var_in, _ = dstats_w
    (kvp, qrow, valid, Wp1, bp1, gp, bp, Wp2, bp2, wparams, pos_moments,
     mu_w, var_w, n) = res
    W1, b1, gw, bw, W2, b2 = wparams
    B, NS, row_w = kvp.shape
    N = NS // S
    q_w = qrow.shape[-1]
    grid = (B, N // TQ)
    kvp_s, qrow_s, vspec, const, outn = _specs(S, C, TQ, row_w, q_w)
    PW = _stats_w(C, G)

    A, cA, mu_p, var_p, pmean, pcov = _fold_pe(Wp1, bp1, gp, bp, pos_moments)
    W1f, b1f, sw, inv_w = _fold_w(W1, b1, gw, bw, mu_w, var_w)

    rows = _N_PAR_MAIN(C, G)
    dkv, dq, dpar = _run(
        _bwd_kernel, grid,
        [kvp_s, qrow_s, vspec, const(A.shape), const((1, C)),
         const(Wp2.shape), const((1, C)), const(W1f.shape), const((1, G)),
         const(W2.shape), const((1, G)), outn],
        [kvp_s, outn, pl.BlockSpec((rows, PW), lambda b, t: (0, 0))],
        [jax.ShapeDtypeStruct(kvp.shape, jnp.bfloat16),
         jax.ShapeDtypeStruct((B, N, C), jnp.float32),
         jax.ShapeDtypeStruct((rows, PW), jnp.float32)],
        (kvp, qrow, valid, A, cA[None], Wp2, bp2[None], W1f, b1f[None], W2,
         b2[None], dout),
        interpret, C=C, S=S, G=G, TQ=TQ,
    )
    dkv, dq, dpar = lax.optimization_barrier((dkv, dq, dpar))
    r0 = 0
    dW1f = dpar[r0:r0 + C, :G]; r0 += C                      # noqa: E702
    db1f = dpar[r0, :G]; r0 += 1                             # noqa: E702
    dW2 = dpar[r0:r0 + G, :G]; r0 += G                       # noqa: E702
    db2 = dpar[r0, :G]; r0 += 1                              # noqa: E702
    dWp2 = dpar[r0:r0 + C, :C]; r0 += C                      # noqa: E702
    dbp2 = dpar[r0, :C]; r0 += 1                             # noqa: E702
    dA = dpar[r0:r0 + 3, :C]; r0 += 3                        # noqa: E702
    dcA = dpar[r0, :C]

    # Unfold the weight-BN affine (W1f = W1*sw, b1f = b1*sw + cw,
    # cw = bw - mu*sw, sw = gw*inv, inv = rsqrt(var+eps)):
    dW1 = dW1f * sw[None, :]
    db1 = db1f * sw
    d_cw = db1f
    d_sw = jnp.sum(dW1f * W1, axis=0) + db1f * b1 - d_cw * mu_w
    d_bw = d_cw
    d_gw = d_sw * inv_w
    d_inv = d_sw * gw
    d_mu = -d_cw * sw + d_mu_in
    d_var = d_inv * (-0.5) * inv_w ** 3 + d_var_in
    # mu = S1/n, var = S2/n - mu^2  =>  per-slot dt1 = c0 + c1 * t1
    d_S1 = d_mu / n + d_var * (-2.0 * mu_w) / n
    d_S2 = d_var / n
    coef = jnp.concatenate([d_S1[None], 2.0 * d_S2[None]], axis=0)
    coef = jnp.concatenate(
        [coef, jnp.zeros((2, _stats_w(C, G) - G), coef.dtype)], axis=1
    )

    rows2 = _N_PAR_STATS(C)
    # dkv/dq from the main backward ride in as aliased inputs 10/11 —
    # the stats pass accumulates into them in place (no second full
    # (B, N*S, row_w) materialisation + XLA add)
    dkv, dq, dpar2 = _run(
        _bwd_stats_kernel, grid,
        [kvp_s, qrow_s, vspec, const(A.shape), const((1, C)),
         const(Wp2.shape), const((1, C)), const(W1.shape), const((1, G)),
         const(coef.shape), kvp_s, outn],
        [kvp_s, outn, pl.BlockSpec((rows2, PW), lambda b, t: (0, 0))],
        [jax.ShapeDtypeStruct(kvp.shape, jnp.bfloat16),
         jax.ShapeDtypeStruct((B, N, C), jnp.float32),
         jax.ShapeDtypeStruct((rows2, PW), jnp.float32)],
        (kvp, qrow, valid, A, cA[None], Wp2, bp2[None], W1, b1[None], coef,
         dkv, dq),
        interpret, io_aliases={10: 0, 11: 1}, C=C, S=S, G=G, TQ=TQ,
    )
    dkv, dq, dpar2 = lax.optimization_barrier((dkv, dq, dpar2))
    r0 = 0
    dW1 = dW1 + dpar2[r0:r0 + C, :G]; r0 += C                # noqa: E702
    db1 = db1 + dpar2[r0, :G]; r0 += 1                       # noqa: E702
    dWp2 = dWp2 + dpar2[r0:r0 + C, :C]; r0 += C              # noqa: E702
    dbp2 = dbp2 + dpar2[r0, :C]; r0 += 1                     # noqa: E702
    dA = dA + dpar2[r0:r0 + 3, :C]; r0 += 3                  # noqa: E702
    dcA = dcA + dpar2[r0, :C]

    # Unfold the pe affine (A = Wp1 * s_p, cA = (bp1 - mu_p) * s_p + bp,
    # s_p = gp * inv_p; mu_p = pmean @ Wp1 + bp1, var_p = w_c^T pcov w_c):
    inv_p = lax.rsqrt(var_p + _EPS)
    s_p = gp * inv_p
    dWp1 = dA * s_p[None, :]
    d_sp = jnp.sum(dA * Wp1, axis=0) + dcA * (bp1 - mu_p)
    dbp1 = dcA * s_p
    d_mu_p = -dcA * s_p
    d_bp = dcA
    d_gp = d_sp * inv_p
    d_var_p = d_sp * gp * (-0.5) * inv_p ** 3
    dWp1 = dWp1 + pmean[:, None] * d_mu_p[None, :]
    dbp1 = dbp1 + d_mu_p
    dWp1 = dWp1 + 2.0 * (pcov @ Wp1) * d_var_p[None, :]

    dqrow = jnp.concatenate(
        [dq, jnp.zeros(dq.shape[:-1] + (q_w - C,), jnp.float32)], axis=-1
    ).astype(jnp.bfloat16)
    dvalid = jnp.zeros_like(valid)
    dwparams = (dW1, db1, d_gw, d_bw, dW2, db2)
    return (dkv, dqrow, dvalid, dWp1, dbp1, d_gp, d_bp, dWp2, dbp2,
            dwparams, None)


gva_core.defvjp(_fwd_vjp, _bwd_vjp)


# ---------------------------------------------------------------------------
# reference composition (pure jnp) — the exact same math unfused; used by
# the CPU/fallback path in the model and by the kernel parity tests.
# ---------------------------------------------------------------------------


def gva_reference(kvp, qrow, valid, Wp1, bp1, gp, bp, Wp2, bp2, wparams,
                  pos_moments, S, C, G, dtype=jnp.bfloat16,
                  running_p=None, running_w=None, pad_mode="renorm"):
    """Unfused jnp composition on the same packed rows. With running_p /
    running_w given, both BNs normalise with those (eval mode) instead of
    batch statistics.

    ``pad_mode`` selects the semantics of slots beyond a query's valid
    neighbour count (only reachable when a stage has fewer than S points):

    * ``"renorm"`` — the kernel semantics: pads are -inf-masked out of the
      softmax, so valid weights renormalise to 1. Used by the Pallas
      kernel parity tests (one source of truth for the kernel math).
    * ``"reference"`` — the torch reference's exact quirk
      (point_transformer_v2m2_base.py:121-125): pads gather the CUDA
      zero row (k=v=0, sign-masked pos=0), their weight encoding of
      (-q + peb(0)) participates in the softmax DENOMINATOR, and the
      weights are zeroed after softmax WITHOUT renormalising. Batch BN
      moments include the pad slots of valid queries, as torch's
      unmasked BatchNorm1d does.
    """
    W1, b1, gw, bw, W2, b2 = wparams
    B, NS, _ = kvp.shape
    N = NS // S
    k_g = kvp[:, :, :C].astype(jnp.float32).reshape(B, N, S, C)
    v_g = kvp[:, :, C:2 * C].astype(jnp.float32).reshape(B, N, S, C)
    pos_k = (
        kvp[:, :, 2 * C:2 * C + 3].astype(jnp.float32)
        + kvp[:, :, 2 * C + 3:2 * C + 6].astype(jnp.float32)
    ).reshape(B, N, S, 3)
    valid = valid > 0  # (B, N, S)
    q = qrow[:, :, :C].astype(jnp.float32)
    pos_q = (
        qrow[:, :, C:C + 3].astype(jnp.float32)
        + qrow[:, :, C + 3:C + 6].astype(jnp.float32)
    )
    mrow = qrow[:, :, C + 6] > 0
    reference_pads = pad_mode == "reference"
    if reference_pads:
        # the CUDA grouping gathers an appended zero row at idx -1
        k_g = jnp.where(valid[..., None], k_g, 0.0)
        v_g = jnp.where(valid[..., None], v_g, 0.0)
        # pad slots of valid queries count in the unmasked torch BN stats
        stat_m = (mrow[:, :, None] & jnp.ones((1, 1, S), bool))
    else:
        stat_m = valid

    pos = jnp.where(valid[..., None], pos_k - pos_q[:, :, None, :], 0.0)
    n_p = jnp.sum(stat_m.astype(jnp.float32))
    if running_p is not None:
        A, cA = _fold_pe_running(Wp1, bp1, gp, bp, *running_p)
        mu_p = var_p = None
    else:
        if pos_moments is None:
            # pad-slot pos rows are exactly 0, so only the count differs
            # between the two pad modes
            pos_moments = jax.tree_util.tree_map(lax.stop_gradient, (
                jnp.sum(pos, axis=(0, 1, 2)),
                jnp.einsum("bnsi,bnsj->ij", pos, pos),
                n_p,
            ))
        A, cA, mu_p, var_p, _, _ = _fold_pe(Wp1, bp1, gp, bp, pos_moments)
    pe0 = (pos.astype(dtype) @ A.astype(dtype)).astype(jnp.float32) + cA
    if not reference_pads:
        pe0 = jnp.where(valid[..., None], pe0, 0.0)
    pe1 = jnp.maximum(pe0, 0.0)
    peb = (pe1.astype(dtype) @ Wp2.astype(dtype)).astype(jnp.float32) + bp2

    r = k_g - q[:, :, None, :] + peb
    v2 = v_g + peb
    t1 = (r.astype(dtype) @ W1.astype(dtype)).astype(jnp.float32) + b1
    m = stat_m.astype(jnp.float32)[..., None]
    n = jnp.maximum(jnp.sum(m), 1.0)
    if running_w is not None:
        mu_w, var_w = running_w
    else:
        mu_w = jnp.sum(t1 * m, axis=(0, 1, 2)) / n
        var_w = jnp.sum(((t1 - mu_w) ** 2) * m, axis=(0, 1, 2)) / n
    t0 = (t1 - mu_w) * lax.rsqrt(var_w + _EPS) * gw + bw
    if not reference_pads:
        t0 = jnp.where(valid[..., None], t0, 0.0)
    u = jnp.maximum(t0, 0.0)
    w = (u @ W2) + b2
    if not reference_pads:
        w = jnp.where(valid[..., None], w, -jnp.inf)
    w = jax.nn.softmax(w, axis=2)
    w = jnp.where(valid[..., None], w, 0.0)
    v2g = v2.reshape(B, N, S, G, C // G)
    out = jnp.einsum("bnsgi,bnsg->bngi", v2g, w).reshape(B, N, C)
    out = jnp.where(mrow[..., None], out, 0.0)
    return out, (mu_w, var_w, n), (mu_p, var_p, n_p)
