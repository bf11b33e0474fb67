"""Slab-resident fused GVA: neighbour gathers INSIDE the kernels.

The round-2 kernels (gva_fused.py) consume an XLA-gathered
``(B, N*S, 2C+6)`` neighbour-row array. That design pays three large
HBM costs per block: the gather itself (row-granularity bound, ~8x
useful-byte waste), its scatter-add backward (same), and S~16x
duplicated kernel reads of the gathered rows.

This module keeps each stage's points sorted along the Morton curve
(ao_tpu.ops.knn_spatial) and exploits neighbour locality: ~92% of k=16
neighbours lie within +-512 curve rows (measured on real 80k S3DIS
scenes, see perf notes). Each query tile loads a contiguous SLAB of
2W+TQ source rows as J=2W/TQ+1 shifted (TQ, rw) blocks — plain
streaming BlockSpecs over a W-padded copy of the source array, no HBM
gather — and gathers neighbour rows IN VMEM with per-block one-hot
matmuls (MXU-rate; Mosaic has no vector dynamic gather). The backward
scatter becomes per-block one-hot-transpose matmuls into (B, T, J, TQ,
rw) tile gradients, combined by a J-term shifted overlap-ADD in XLA
(streaming, no scatter).

Neighbours outside the window are masked invalid (callers use the
window-restricted kNN so the graph is in-window by construction; see
knn_self_presorted). The attention math itself is shared with
gva_fused (_recompute / _softmax / _peb_bwd) — one source of truth,
reference semantics: point_transformer_v2m2_base.py:48-126.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

from .gva_fused import (
    _EPS,
    _N_PAR_MAIN,
    _expand_valid,
    _fold_pe,
    _fold_pe_running,
    _fold_w,
    _mm,
    _mm_bf16,
    _mmt_bf16,
    _mtm,
    _pad_lanes,
    _peb_bwd,
    _recompute,
    _softmax,
    _stats_w,
)

__all__ = [
    "gva_slab_core",
    "gva_slab_core_eval",
    "compute_pos_moments_slab",
    "pad_for_slab",
    "overlap_add",
    "lane_layout",
    "SPLIT_MIN_C",
]

# Stages at/above this channel width use the split row layout (below it
# a row already fits one 128-lane block, so there is nothing to narrow).
SPLIT_MIN_C = 96


def lane_layout(C):
    """Slab row lane layout for channel width C.

    split=True rows are ``[k(C) | pos-hi3 | pos-lo3 | 0.. (KW lanes) |
    v(C) | 0.. (KW lanes)]`` — the stats / pos / bwd-stats passes (which
    never touch v) then stream and one-hot-gather ONLY the first KW-lane
    block of every slab, halving their MXU gather work and HBM traffic.
    split=False keeps the legacy packed ``[k | v | pos6]`` row (C < 96:
    the whole row already fits one 128-lane block).

    ``lanes`` is the (v_off, pos_off) pair consumed by
    gva_fused._recompute; ``row_w`` the unpadded row width callers must
    build."""
    if C >= SPLIT_MIN_C:
        KW = -(-(C + 6) // 128) * 128
        VW = -(-C // 128) * 128  # v block needs only C lanes (no pos6)
        return dict(split=True, KW=KW, row_w=KW + VW,
                    lanes=(KW, C), pos_off=C)
    return dict(split=False, KW=None, row_w=2 * C + 6,
                lanes=None, pos_off=2 * C)


# ---------------------------------------------------------------------------
# host-side helpers
# ---------------------------------------------------------------------------


def _check_layout(kv_pad, C):
    """Entry-point guard: the caller's row width must match the layout
    this module would derive for C (SPLIT_MIN_C is mutable in tests; a
    stale layout silently mis-slices pos/v lanes)."""
    lay = lane_layout(C)
    assert kv_pad.shape[-1] == lay["row_w"], (
        kv_pad.shape, C, lay["row_w"]
    )
    return lay


def pad_for_slab(kv, N, TQ, J):
    """Pad (B, N, rw) with W = (J-1)//2 * TQ zero rows on each side and a
    tail pad to the TQ grid, viewed as (B, T+J-1, TQ, rw) blocks."""
    B, n, rw = kv.shape
    W = (J - 1) // 2 * TQ
    Np = -(-N // TQ) * TQ
    kv = jnp.pad(kv, ((0, 0), (W, W + Np - n), (0, 0)))
    return kv.reshape(B, (Np + 2 * W) // TQ, TQ, rw)


def overlap_add(dkv_tiles, N, TQ, J):
    """(B, T, J, TQ, rw) per-tile slab grads -> (B, N, rw) via J shifted
    streaming adds (the transpose of pad_for_slab's window view)."""
    B, T, _, _, rw = dkv_tiles.shape
    W = (J - 1) // 2 * TQ
    Np = T * TQ
    acc = jnp.zeros((B, Np + 2 * W, rw), dkv_tiles.dtype)
    for j in range(J):
        acc = acc.at[:, j * TQ : j * TQ + Np].add(
            dkv_tiles[:, :, j].reshape(B, Np, rw)
        )
    return acc[:, W : W + N]


# ---------------------------------------------------------------------------
# in-kernel gather / scatter
# ---------------------------------------------------------------------------


def _idx_col(idx_ts, t, TQ, S, J):
    """(TQ, S) f32 W-padded GLOBAL neighbour ids -> (TQ*S, 1) column.

    _expand_valid transports values through a bf16 one-hot matmul,
    which is integer-exact only up to 256 — global row ids are not
    (they reach N + 2W). Split the id relative to this tile's slab
    base into a block index (< J) and an in-block offset (< TQ <= 256),
    transport each exactly, recombine in f32 (exact below 2^24).
    Out-of-slab ids (only possible on ``valid``-masked slots) clamp to
    the slab, matching the masked-garbage semantics of the gather."""
    assert TQ <= 256 and TQ & (TQ - 1) == 0, TQ  # off/blk bf16-exact
    base = (t * TQ).astype(jnp.float32)
    rel = jnp.clip(idx_ts - base, 0.0, float(J * TQ - 1))
    blk = jnp.floor(rel * (1.0 / TQ))
    off = rel - blk * TQ
    col = _expand_valid(blk, TQ, S) * TQ + _expand_valid(off, TQ, S)
    return col + base


def _gather_rows(slab_refs, idxc, t, TQ, S):
    """rows[r] = slab[idxc[r] - t*TQ] via J per-block one-hot matmuls.

    idxc holds W-padded GLOBAL row ids as f32 (exact below 2^24); block j
    covers padded rows [(t+j)*TQ, (t+j+1)*TQ)."""
    rows = None
    col = lax.broadcasted_iota(jnp.int32, (TQ * S, TQ), 1).astype(jnp.float32)
    for j, ref in enumerate(slab_refs):
        base = ((t + j) * TQ).astype(jnp.float32)
        oh = (col + base == idxc).astype(jnp.bfloat16)
        part = _mm_bf16(oh, ref[0][0])
        rows = part if rows is None else rows + part
    return rows  # (TQ*S, rw) f32


def _scatter_rows(delta, idxc, t, TQ, S, J, out_ref, add_in_ref=None):
    """out[j] (+)= oh_j^T @ delta — the exact transpose of _gather_rows."""
    col = lax.broadcasted_iota(jnp.int32, (TQ * S, TQ), 1).astype(jnp.float32)
    deltab = delta.astype(jnp.bfloat16)
    for j in range(J):
        base = ((t + j) * TQ).astype(jnp.float32)
        oh = (col + base == idxc).astype(jnp.bfloat16)
        part = lax.dot_general(
            oh, deltab, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TQ, rw)
        if add_in_ref is not None:
            part = part + add_in_ref[0, 0, j].astype(jnp.float32)
        out_ref[0, 0, j] = part.astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# kernels — gather in, then the shared gva_fused math
# ---------------------------------------------------------------------------


def _env_from_slab(slab_refs, idx_ref, qrow_ref, valid_ref, A, cA, Wp2, bp2,
                   W1x, b1x, t, *, C, S, TQ, J, lanes=None):
    idxc = _idx_col(idx_ref[0].astype(jnp.float32), t, TQ, S, J)
    rows = _gather_rows(slab_refs, idxc, t, TQ, S).astype(jnp.bfloat16)
    env = _recompute(rows, qrow_ref[0], valid_ref[0], A, cA, Wp2, bp2,
                     W1x, b1x, C=C, S=S, TQ=TQ, lanes=lanes)
    env["idxc"] = idxc
    return env


def _pos_kernel(idx_ref, qrow_ref, valid_ref, *slab_then_out, C, S, G, TQ, J,
                pos_off):
    slab_refs, sums_ref = slab_then_out[:-1], slab_then_out[-1]
    b = pl.program_id(0)
    t = pl.program_id(1)
    idxc = _idx_col(idx_ref[0].astype(jnp.float32), t, TQ, S, J)
    rows = _gather_rows(slab_refs, idxc, t, TQ, S)
    pos = (
        rows[:, pos_off : pos_off + 3]
        + rows[:, pos_off + 3 : pos_off + 6]
    )
    qrow = qrow_ref[0]
    valid = _expand_valid(valid_ref[0], TQ, S)
    from .gva_fused import _seg_matrix

    M = _seg_matrix(TQ, S)
    pos_qs = (
        _mm_bf16(M, qrow[:, C : C + 3])
        + _mm_bf16(M, qrow[:, C + 3 : C + 6])
    )  # exact: one-hot M, bf16 hi/lo lanes
    pos = (pos - pos_qs) * valid

    @pl.when((b == 0) & (t == 0))
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    Wd = sums_ref.shape[1]
    sp = _pad_lanes(jnp.sum(pos, axis=0, keepdims=True), Wd)
    pp = _pad_lanes(_mtm(pos, pos), Wd)
    cnt = _pad_lanes(jnp.sum(valid, axis=0, keepdims=True), Wd)
    sums_ref[...] += jnp.concatenate([sp, pp, cnt], axis=0)


def _stats_kernel(idx_ref, qrow_ref, valid_ref, A_ref, cA_ref, Wp2_ref,
                  bp2_ref, W1_ref, b1_ref, *slab_then_out, C, S, G, TQ, J,
                  pos_off):
    slab_refs, sums_ref = slab_then_out[:-1], slab_then_out[-1]
    b = pl.program_id(0)
    t = pl.program_id(1)
    # narrow rows: no value lanes (stats never consume v2)
    env = _env_from_slab(
        slab_refs, idx_ref, qrow_ref, valid_ref, A_ref[...], cA_ref[...],
        Wp2_ref[...], bp2_ref[...], W1_ref[...], b1_ref[...], t,
        C=C, S=S, TQ=TQ, J=J, lanes=(None, pos_off),
    )

    @pl.when((b == 0) & (t == 0))
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    t1, valid, pos = env["t"], env["valid"], env["pos"]
    Wd = sums_ref.shape[1]
    st = _pad_lanes(jnp.sum(t1 * valid, axis=0, keepdims=True), Wd)
    st2 = _pad_lanes(jnp.sum(t1 * t1 * valid, axis=0, keepdims=True), Wd)
    cnt = _pad_lanes(jnp.sum(valid, axis=0, keepdims=True), Wd)
    sp = _pad_lanes(jnp.sum(pos, axis=0, keepdims=True), Wd)
    pp = _pad_lanes(_mtm(pos, pos), Wd)
    sums_ref[...] += jnp.concatenate([st, st2, cnt, sp, pp], axis=0)


def _fwd_kernel(idx_ref, qrow_ref, valid_ref, A_ref, cA_ref, Wp2_ref,
                bp2_ref, W1f_ref, b1f_ref, W2_ref, b2_ref,
                *slab_then_out, C, S, G, TQ, J, lanes=None):
    slab_refs, out_ref = slab_then_out[:-1], slab_then_out[-1]
    t = pl.program_id(1)
    env = _env_from_slab(
        slab_refs, idx_ref, qrow_ref, valid_ref, A_ref[...], cA_ref[...],
        Wp2_ref[...], bp2_ref[...], W1f_ref[...], b1f_ref[...], t,
        C=C, S=S, TQ=TQ, J=J, lanes=lanes,
    )
    from .gva_fused import _expand_matrix, _mmt

    u = jnp.maximum(env["t"], 0.0)
    w = _mm(u, W2_ref[...]) + b2_ref[...]
    sm = _softmax(w, env["valid"], env["M"])
    E = _expand_matrix(G, C)
    contrib = env["v2"] * _mm(sm, E)
    out_ref[0] = (_mtm(env["M"], contrib) * env["mrow"]).astype(out_ref.dtype)


def _mtm_mom(a, b):  # a.T @ b in bf16 (stat-moment accumulations)
    return lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


# lane width of the per-row/per-query stat-moment outputs ([valid | t])
_MOM_W = 128


def _bwd_kernel(idx_ref, qrow_ref, valid_ref, A_ref, cA_ref, Wp2_ref,
                bp2_ref, W1f_ref, b1f_ref, W2_ref, b2_ref, dout_ref,
                *slab_then_out, C, S, G, TQ, J, lanes=None):
    """Main backward + BN-stat correction MOMENTS in one pass.

    The stat-correction backward applies dt1 = (c0 + t1*c1)*valid per
    edge, where (c0, c1) are per-group scalars known only after this
    kernel's own global parameter sums (they chain through dW1f/db1f).
    Rather than a second gather+scatter pass (the round-3 design,
    ~25% of the backward's gather traffic), this kernel also emits the
    moments the correction is LINEAR in — per-edge weights are only
    ``valid`` and ``t`` — and the host applies (a0, a1) afterwards:

      * dmom tiles: scatter of [valid | t] per neighbour row -> the
        rows' correction dk = (a0*V0 + a1*VT) @ W1^T
      * dqmom: per-query sums M^T [valid | t] -> dq correction
      * dmom_par: (1+G, 6C) accumulator of valid- and t-weighted sums
        of [r | pe1 | relu-mask u | vec(pos x u)] -> the dW1/dWp2/dA/
        dcA corrections (see _bwd_vjp)."""
    slab_refs = slab_then_out[:-6]
    (dkv_ref, dq_ref, dpar_ref, dmom_ref, dqmom_ref,
     dmom_par_ref) = slab_then_out[-6:]
    b = pl.program_id(0)
    t = pl.program_id(1)
    env = _env_from_slab(
        slab_refs, idx_ref, qrow_ref, valid_ref, A_ref[...], cA_ref[...],
        Wp2_ref[...], bp2_ref[...], W1f_ref[...], b1f_ref[...], t,
        C=C, S=S, TQ=TQ, J=J, lanes=lanes,
    )
    from .gva_fused import _expand_matrix, _mmt

    M, valid = env["M"], env["valid"]
    u = jnp.maximum(env["t"], 0.0)
    W2 = W2_ref[...]
    w = _mm(u, W2) + b2_ref[...]
    sm = _softmax(w, valid, M)
    E = _expand_matrix(G, C)
    sme = _mm(sm, E)

    dout = dout_ref[0].astype(jnp.float32) * env["mrow"]
    dout_r = _mm(M, dout)
    dv2 = sme * dout_r
    dsm = _mmt(env["v2"] * dout_r, E)
    dw = sm * (dsm - _mm(M, _mtm(M, sm * dsm)))
    du = _mmt(dw, W2)
    dt = jnp.where(env["t"] > 0, du, 0.0) * valid
    dr = _mmt_bf16(dt, W1f_ref[...])
    dpeb = dr + dv2
    dpe0, dWp2, dbp2, dA, dcA = _peb_bwd(env, dpeb, Wp2_ref[...])

    rw = dkv_ref.shape[-1]
    if lanes is not None:  # split layout: [dk at 0 | dv at KW]
        v_off = lanes[0]
        parts = [dr, jnp.zeros((TQ * S, v_off - C), jnp.float32), dv2,
                 jnp.zeros((TQ * S, rw - v_off - C), jnp.float32)]
    else:
        parts = [dr, dv2, jnp.zeros((TQ * S, rw - 2 * C), jnp.float32)]
    # Mosaic rejects 0-width vector types — drop empty pad blocks
    delta = jnp.concatenate([p for p in parts if p.shape[1]], axis=1)
    _scatter_rows(delta, env["idxc"], t, TQ, S, J, dkv_ref)
    dq_ref[0] = (-_mtm(M, dr)).astype(dq_ref.dtype)

    # --- stat-correction moments ---
    tv = jnp.concatenate([valid, env["t"]], axis=1)  # (TQ*S, 1+G)
    tv_pad = jnp.concatenate(
        [tv, jnp.zeros((TQ * S, _MOM_W - 1 - G), jnp.float32)], axis=1
    )
    _scatter_rows(tv_pad, env["idxc"], t, TQ, S, J, dmom_ref)
    dqmom_ref[0] = _pad_lanes(_mtm(M, tv), _MOM_W)
    # relu gate of the pe MLP (per _peb_bwd's dpe0 = gate * dpe1 * valid)
    ug = jnp.where(env["pe0"] > 0, 1.0, 0.0) * valid
    # vec(pos x u) as [x*u | y*u | z*u] lane blocks (Mosaic cannot lower
    # a (TQ*S, 3, C) -> (TQ*S, 3C) vector reshape)
    posu = jnp.concatenate(
        [env["pos"][:, i : i + 1] * ug for i in range(3)], axis=1
    )

    @pl.when((b == 0) & (t == 0))
    def _():
        dpar_ref[...] = jnp.zeros_like(dpar_ref)
        dmom_par_ref[...] = jnp.zeros_like(dmom_par_ref)

    off = 0
    for part in (env["r"], env["pe1"], ug, posu):
        wdt = part.shape[1]
        dmom_par_ref[:, off:off + wdt] += _mtm_mom(tv, part)
        off += wdt

    Wd = dpar_ref.shape[1]
    dpar_ref[...] += jnp.concatenate(
        [
            _pad_lanes(_mtm(env["r"], dt), Wd),
            _pad_lanes(jnp.sum(dt, axis=0, keepdims=True), Wd),
            _pad_lanes(_mtm(u, dw), Wd),
            _pad_lanes(jnp.sum(dw, axis=0, keepdims=True), Wd),
            _pad_lanes(dWp2, Wd),
            _pad_lanes(dbp2, Wd),
            _pad_lanes(dA, Wd),
            _pad_lanes(dcA, Wd),
        ],
        axis=0,
    )


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _slab_specs(TQ, w, J):
    """J shifted streaming views of the (B, T+J-1, TQ, row_w) slab array;
    w < row_w selects only its leading w-lane block (the split layout's
    k|pos half — w must divide row_w)."""
    return [
        pl.BlockSpec(
            (1, 1, TQ, w),
            functools.partial(lambda b, t, j=0: (b, t + j, 0, 0), j=j),
        )
        for j in range(J)
    ]


def _specs(S, C, TQ, rw, q_w, J):
    idx = pl.BlockSpec((1, TQ, S), lambda b, t: (b, t, 0))
    qrow = pl.BlockSpec((1, TQ, q_w), lambda b, t: (b, t, 0))
    vspec = pl.BlockSpec((1, TQ, S), lambda b, t: (b, t, 0))
    slabs = _slab_specs(TQ, rw, J)

    def const(shape):
        return pl.BlockSpec(shape, lambda b, t: tuple(0 for _ in shape))

    outn = pl.BlockSpec((1, TQ, C), lambda b, t: (b, t, 0))
    dkv_tiles = pl.BlockSpec((1, 1, J, TQ, rw), lambda b, t: (b, t, 0, 0, 0))
    return idx, qrow, vspec, slabs, const, outn, dkv_tiles


def _run(kernel, grid, in_specs, out_specs, out_shape, args, interpret,
         io_aliases=None, **kw):
    return pl.pallas_call(
        functools.partial(kernel, **kw),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        input_output_aliases=io_aliases or {},
    )(*args)


# ---------------------------------------------------------------------------
# custom-vjp core
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16, 17, 18)
)
def gva_slab_core(kv_pad, idxp, qrow, valid, Wp1, bp1, gp, bp, Wp2, bp2,
                  wparams, pos_moments, N, S, C, G, TQ, J, interpret=False):
    """Slab-resident fused GVA (train mode).

    kv_pad (B, T+J-1, TQ, rw) bf16 — pad_for_slab of the (B, N, rw)
    [k | v | coord-hi3 | coord-lo3] rows in Morton-sorted order;
    idxp (B, Np, S) int32 — neighbour ids in W-PADDED row coords
    (id + W), out-of-window slots already masked in ``valid``;
    qrow (B, Np, C+7) bf16; valid (B, Np, S) bf16.
    Returns (out (B, Np, C) f32, weight-BN stats, pe-BN stats).
    """
    out, _, stats = _fwd_inner(kv_pad, idxp, qrow, valid, Wp1, bp1, gp, bp,
                               Wp2, bp2, wparams, pos_moments,
                               N, S, C, G, TQ, J, interpret)
    return (out,) + stats


def compute_pos_moments_slab(kv_pad, idxp, qrow, valid, S, C, G, TQ, J,
                             interpret=False):
    kv_pad, idxp, qrow, valid = jax.tree_util.tree_map(
        lax.stop_gradient, (kv_pad, idxp, qrow, valid)
    )
    B, TJ, _, rw = kv_pad.shape
    T = TJ - (J - 1)
    q_w = qrow.shape[-1]
    grid = (B, T)
    lay = _check_layout(kv_pad, C)
    idx_s, qrow_s, vspec, slabs, const, outn, _ = _specs(S, C, TQ, rw, q_w, J)
    slabs_n = _slab_specs(TQ, lay["KW"], J) if lay["split"] else slabs
    SW = _stats_w(C, G)
    psums = _run(
        _pos_kernel, grid,
        [idx_s, qrow_s, vspec] + slabs_n,
        pl.BlockSpec((5, SW), lambda b, t: (0, 0)),
        jax.ShapeDtypeStruct((5, SW), jnp.float32),
        (idxp, qrow, valid) + (kv_pad,) * J,
        interpret, C=C, S=S, G=G, TQ=TQ, J=J, pos_off=lay["pos_off"],
    )
    psums = lax.optimization_barrier(psums)
    return jax.tree_util.tree_map(
        lax.stop_gradient, (psums[0, :3], psums[1:4, :3], psums[4, 0])
    )


def _fwd_inner(kv_pad, idxp, qrow, valid, Wp1, bp1, gp, bp, Wp2, bp2,
               wparams, pos_moments, N, S, C, G, TQ, J, interpret):
    W1, b1, gw, bw, W2, b2 = wparams
    B, TJ, _, rw = kv_pad.shape
    T = TJ - (J - 1)
    q_w = qrow.shape[-1]
    grid = (B, T)
    lay = _check_layout(kv_pad, C)
    idx_s, qrow_s, vspec, slabs, const, outn, _ = _specs(S, C, TQ, rw, q_w, J)
    slabs_n = _slab_specs(TQ, lay["KW"], J) if lay["split"] else slabs
    SW = _stats_w(C, G)

    if pos_moments is None:
        pos_moments = compute_pos_moments_slab(
            kv_pad, idxp, qrow, valid, S, C, G, TQ, J, interpret
        )
    pos_moments = jax.tree_util.tree_map(lax.stop_gradient, pos_moments)

    A, cA, mu_p, var_p, _, _ = _fold_pe(Wp1, bp1, gp, bp, pos_moments)
    sums = _run(
        _stats_kernel, grid,
        [idx_s, qrow_s, vspec, const(A.shape), const((1, C)),
         const(Wp2.shape), const((1, C)), const(W1.shape), const((1, G))]
        + slabs_n,
        pl.BlockSpec((7, SW), lambda b, t: (0, 0)),
        jax.ShapeDtypeStruct((7, SW), jnp.float32),
        (idxp, qrow, valid, A, cA[None], Wp2, bp2[None], W1, b1[None])
        + (kv_pad,) * J,
        interpret, C=C, S=S, G=G, TQ=TQ, J=J, pos_off=lay["pos_off"],
    )
    sums = lax.optimization_barrier(sums)
    n = jnp.maximum(sums[2, 0], 1.0)
    mu_w = sums[0, :G] / n
    var_w = jnp.maximum(sums[1, :G] / n - mu_w * mu_w, 0.0)
    W1f, b1f, _, _ = _fold_w(W1, b1, gw, bw, mu_w, var_w)
    out = _run(
        _fwd_kernel, grid,
        [idx_s, qrow_s, vspec, const(A.shape), const((1, C)),
         const(Wp2.shape), const((1, C)), const(W1f.shape), const((1, G)),
         const(W2.shape), const((1, G))] + slabs,
        outn,
        jax.ShapeDtypeStruct((B, T * TQ, C), jnp.float32),
        (idxp, qrow, valid, A, cA[None], Wp2, bp2[None], W1f, b1f[None], W2,
         b2[None]) + (kv_pad,) * J,
        interpret, C=C, S=S, G=G, TQ=TQ, J=J, lanes=lay["lanes"],
    )
    out = lax.optimization_barrier(out)
    res = (kv_pad, idxp, qrow, valid, Wp1, bp1, gp, bp, Wp2, bp2, wparams,
           pos_moments, mu_w, var_w, n)
    return out, res, ((mu_w, var_w, n), (mu_p, var_p, pos_moments[2]))


def gva_slab_core_eval(kv_pad, idxp, qrow, valid, Wp1, bp1, gp, bp, Wp2, bp2,
                       wparams, running_p, running_w, N, S, C, G, TQ, J,
                       interpret=False):
    W1, b1, gw, bw, W2, b2 = wparams
    B, TJ, _, rw = kv_pad.shape
    T = TJ - (J - 1)
    q_w = qrow.shape[-1]
    grid = (B, T)
    lay = _check_layout(kv_pad, C)
    idx_s, qrow_s, vspec, slabs, const, outn, _ = _specs(S, C, TQ, rw, q_w, J)
    A, cA = _fold_pe_running(Wp1, bp1, gp, bp, *running_p)
    W1f, b1f, _, _ = _fold_w(W1, b1, gw, bw, *running_w)
    out = _run(
        _fwd_kernel, grid,
        [idx_s, qrow_s, vspec, const(A.shape), const((1, C)),
         const(Wp2.shape), const((1, C)), const(W1f.shape), const((1, G)),
         const(W2.shape), const((1, G))] + slabs,
        outn,
        jax.ShapeDtypeStruct((B, T * TQ, C), jnp.float32),
        (idxp, qrow, valid, A, cA[None], Wp2, bp2[None], W1f, b1f[None], W2,
         b2[None]) + (kv_pad,) * J,
        interpret, C=C, S=S, G=G, TQ=TQ, J=J, lanes=lay["lanes"],
    )
    return lax.optimization_barrier(out)


def _fwd_vjp(kv_pad, idxp, qrow, valid, Wp1, bp1, gp, bp, Wp2, bp2, wparams,
             pos_moments, N, S, C, G, TQ, J, interpret):
    out, res, stats = _fwd_inner(kv_pad, idxp, qrow, valid, Wp1, bp1, gp, bp,
                                 Wp2, bp2, wparams, pos_moments,
                                 N, S, C, G, TQ, J, interpret)
    return (out,) + stats, res


def _bwd_vjp(N, S, C, G, TQ, J, interpret, res, cts):
    dout, dstats_w, _dstats_p = cts
    d_mu_in, d_var_in, _ = dstats_w
    (kv_pad, idxp, qrow, valid, Wp1, bp1, gp, bp, Wp2, bp2, wparams,
     pos_moments, mu_w, var_w, n) = res
    W1, b1, gw, bw, W2, b2 = wparams
    B, TJ, _, rw = kv_pad.shape
    T = TJ - (J - 1)
    q_w = qrow.shape[-1]
    grid = (B, T)
    lay = _check_layout(kv_pad, C)
    idx_s, qrow_s, vspec, slabs, const, outn, dkv_tiles_spec = _specs(
        S, C, TQ, rw, q_w, J
    )
    PW = _stats_w(C, G)

    A, cA, mu_p, var_p, pmean, pcov = _fold_pe(Wp1, bp1, gp, bp, pos_moments)
    W1f, b1f, sw, inv_w = _fold_w(W1, b1, gw, bw, mu_w, var_w)

    rows = _N_PAR_MAIN(C, G)
    XW = -(-6 * C // 128) * 128
    mom_tiles_spec = pl.BlockSpec(
        (1, 1, J, TQ, _MOM_W), lambda b, t: (b, t, 0, 0, 0)
    )
    mom_q_spec = pl.BlockSpec((1, TQ, _MOM_W), lambda b, t: (b, t, 0))
    dkv_t, dq, dpar, dmom_t, dqmom, dmom_par = _run(
        _bwd_kernel, grid,
        [idx_s, qrow_s, vspec, const(A.shape), const((1, C)),
         const(Wp2.shape), const((1, C)), const(W1f.shape), const((1, G)),
         const(W2.shape), const((1, G)), outn] + slabs,
        [dkv_tiles_spec, outn, pl.BlockSpec((rows, PW), lambda b, t: (0, 0)),
         mom_tiles_spec, mom_q_spec,
         pl.BlockSpec((1 + G, XW), lambda b, t: (0, 0))],
        [jax.ShapeDtypeStruct((B, T, J, TQ, rw), jnp.bfloat16),
         jax.ShapeDtypeStruct((B, T * TQ, C), jnp.float32),
         jax.ShapeDtypeStruct((rows, PW), jnp.float32),
         jax.ShapeDtypeStruct((B, T, J, TQ, _MOM_W), jnp.bfloat16),
         jax.ShapeDtypeStruct((B, T * TQ, _MOM_W), jnp.float32),
         jax.ShapeDtypeStruct((1 + G, XW), jnp.float32)],
        (idxp, qrow, valid, A, cA[None], Wp2, bp2[None], W1f, b1f[None], W2,
         b2[None], dout) + (kv_pad,) * J,
        interpret, C=C, S=S, G=G, TQ=TQ, J=J, lanes=lay["lanes"],
    )
    dkv_t, dq, dpar, dmom_t, dqmom, dmom_par = lax.optimization_barrier(
        (dkv_t, dq, dpar, dmom_t, dqmom, dmom_par)
    )
    r0 = 0
    dW1f = dpar[r0:r0 + C, :G]; r0 += C                      # noqa: E702
    db1f = dpar[r0, :G]; r0 += 1                             # noqa: E702
    dW2 = dpar[r0:r0 + G, :G]; r0 += G                       # noqa: E702
    db2 = dpar[r0, :G]; r0 += 1                              # noqa: E702
    dWp2 = dpar[r0:r0 + C, :C]; r0 += C                      # noqa: E702
    dbp2 = dpar[r0, :C]; r0 += 1                             # noqa: E702
    dA = dpar[r0:r0 + 3, :C]; r0 += 3                        # noqa: E702
    dcA = dpar[r0, :C]

    dW1 = dW1f * sw[None, :]
    db1 = db1f * sw
    d_cw = db1f
    d_sw = jnp.sum(dW1f * W1, axis=0) + db1f * b1 - d_cw * mu_w
    d_bw = d_cw
    d_gw = d_sw * inv_w
    d_inv = d_sw * gw
    d_mu = -d_cw * sw + d_mu_in
    d_var = d_inv * (-0.5) * inv_w ** 3 + d_var_in
    d_S1 = d_mu / n + d_var * (-2.0 * mu_w) / n
    d_S2 = d_var / n
    c0 = d_S1
    c1 = 2.0 * d_S2

    # --- apply the stat-correction analytically from the moments ---
    # pass-2 semantics: dt1 = (c0 + t1*c1)*valid with t1 the UNFOLDED
    # stats-path activation. env["t"] is the folded one: t1*valid =
    # (t - cw*valid)/sw, so dt1 = a0*valid + a1*t with
    cw = b1f - b1 * sw
    a0 = c0 - c1 * cw / sw
    a1 = c1 / sw
    # per-row dk correction: (a0*V0 + a1*VT) @ W1^T — the correction's
    # dr1 = dt1 @ W1^T uses the UNFOLDED W1, matching the stats pass
    W = (J - 1) // 2 * TQ
    Np = T * TQ
    mom_rows = overlap_add(
        dmom_t.astype(jnp.float32), Np, TQ, J
    )  # (B, Np, MOM_W) at pad offset W
    V0 = mom_rows[..., 0:1]
    VT = mom_rows[..., 1:1 + G]
    dk_corr = _mm((a0[None, None] * V0 + a1[None, None] * VT
                   ).reshape(B * Np, G), W1.T).reshape(B, Np, C)
    # per-query dq correction: -(a0*Q0 + a1*QT) @ W1^T
    Q0 = dqmom[..., 0:1]
    QT = dqmom[..., 1:1 + G]
    dq = dq - _mm((a0[None, None] * Q0 + a1[None, None] * QT
                   ).reshape(B * Np, G), W1.T).reshape(B, Np, C)
    # parameter corrections. dmom_par rows: 0 = valid-weighted,
    # 1..G = t-weighted; cols [r | pe1 | u | vec(pos x u)]
    Rv, RT = dmom_par[0, :C], dmom_par[1:, :C].T            # (C,), (C, G)
    Pv, PT = dmom_par[0, C:2 * C], dmom_par[1:, C:2 * C].T
    Uv, UT = dmom_par[0, 2 * C:3 * C], dmom_par[1:, 2 * C:3 * C].T
    Av = dmom_par[0, 3 * C:6 * C].reshape(3, C)
    AT = dmom_par[1:, 3 * C:6 * C].reshape(G, 3, C)
    dW1 = dW1 + Rv[:, None] * a0[None, :] + RT * a1[None, :]
    dsum1 = a0 * n + a1 * (sw * mu_w * n + cw * n)  # sum_e dt1 per group
    db1 = db1 + dsum1
    dWp2 = dWp2 + (Pv[:, None] * a0[None, :] + PT * a1[None, :]) @ W1.T
    dbp2 = dbp2 + dsum1 @ W1.T
    Kc = Wp2 @ W1  # (C, G): dpe1 = dt1 @ (Wp2 W1)^T
    dcA = dcA + Uv * (Kc @ a0) + (UT * Kc) @ a1
    dA = dA + Av * (Kc @ a0)[None, :] + jnp.einsum(
        "g,gxc,cg->xc", a1, AT, Kc
    )

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

    # tile-slab grads -> padded row grads (J shifted streaming adds),
    # back in the (B, T+J-1, TQ, rw) layout of kv_pad
    dkv_rows = overlap_add(dkv_t, Np, TQ, J)  # (B, Np, rw) at pad offset W
    dkv_rows = dkv_rows.at[..., :C].add(dk_corr.astype(dkv_rows.dtype))
    dkv_pad = jnp.pad(dkv_rows, ((0, 0), (W, W), (0, 0))).reshape(
        B, TJ, TQ, rw
    )

    dqrow = jnp.concatenate(
        [dq, jnp.zeros(dq.shape[:-1] + (q_w - C,), jnp.float32)], axis=-1
    ).astype(jnp.bfloat16)
    dvalid = jnp.zeros_like(valid)
    dwparams = (dW1, db1, d_gw, d_bw, dW2, db2)
    return (dkv_pad, None, dqrow, dvalid, dWp1, dbp1, d_gp, d_bp, dWp2, dbp2,
            dwparams, None)


gva_slab_core.defvjp(_fwd_vjp, _bwd_vjp)
