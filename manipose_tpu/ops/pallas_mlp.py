"""Pallas TPU fused MLP: fc1 + exact-GELU + fc2 in one VMEM pass.

The MixSTE trunk's MLP (``hpe/mh_so3_hpe/architectures/mix_ste.py:194-222``)
is two GEMMs with a GELU between them. XLA cannot fuse across GEMMs, so
the (rows, 4·head_dim·heads) intermediate makes a full HBM round-trip —
at the flagship shape (M=66096 rows, C=512, H=1024, bf16) that is
~270 MB of traffic per block per step that this kernel eliminates by
keeping the intermediate in VMEM. Measured on-chip (BASELINE.md r2 MLP
study): isolated fwd 1.88 ms fused vs 2.40 ms XLA (+28%), isolated
fwd+grad 4.30 vs 4.40 ms (parity). In the FULL train graph, however,
``mlp_impl="pallas"`` measures 17.6 vs 42.8 seq/s on this tunnel
backend: 32 Mosaic launches per step pay a per-launch dispatch overhead
that dwarfs the kernel win (the same pathology that makes full-model
Pallas attention unviable here, CLAUDE.md). The kernel ships as a
validated option — on directly-attached TPUs without the remote-dispatch
tax the isolated numbers are the relevant ones. The backward kernel
recomputes the intermediate from x in VMEM (no stored residual beyond x)
and accumulates the weight/bias grads across the sequential TPU grid.

Numerics: fp32 accumulation for both GEMMs; GELU is the exact erf form
via the Abramowitz-Stegun 7.1.26 rational approximation (max abs error
1.5e-7 — Pallas TPU has no erf lowering; the error is ~25x below bf16
resolution, and the fused path is only selected under bf16 compute).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import needs_interpret as _needs_interpret

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def _erf(x):
    # Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7)
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x * _INV_SQRT2))


def _gelu_grad(x):
    cdf = 0.5 * (1.0 + _erf(x * _INV_SQRT2))
    pdf = _INV_SQRT2PI * jnp.exp(-0.5 * x * x)
    return cdf + x * pdf


def pick_tile(m: int, target: int) -> int:
    """Largest multiple-of-8 divisor of m that is <= target (0 if none
    >= 128 exists — caller falls back to the XLA path)."""
    t = min(target, m)
    for tm in range(t - t % 8, 127, -8):
        if m % tm == 0:
            return tm
    return 0


def supported(m: int) -> bool:
    # both kernels must tile: forward targets <=1024 rows, backward <=512
    # (its VMEM residency is ~2x — recomputed intermediate + grads)
    return pick_tile(m, 1024) >= 128 and pick_tile(m, 512) >= 128


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    a = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    a = a + b1_ref[:].astype(jnp.float32)
    h = _gelu(a).astype(x_ref.dtype)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (o + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _full_spec(r, c):
    return pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _forward(x, w1, b1, w2, b2):
    m, c = x.shape
    h = w1.shape[1]
    tm = pick_tile(m, 1024)
    assert tm, f"unsupported row count {m} for the fused MLP kernel"
    row_spec = pl.BlockSpec((tm, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(m // tm,),
        in_specs=[
            row_spec,
            _full_spec(c, h),
            _full_spec(1, h),
            _full_spec(h, c),
            _full_spec(1, c),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        interpret=_needs_interpret(),
    )(x, w1, b1.reshape(1, h), w2, b2.reshape(1, c))


# ---------------------------------------------------------------------------
# backward: one pass over x/g recomputing the intermediate in VMEM;
# dw/db accumulate across the (sequential) grid into constant-index
# fp32 outputs
# ---------------------------------------------------------------------------
def _bwd_kernel(x_ref, g_ref, w1_ref, b1_ref, w2_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    x = x_ref[:]
    g = g_ref[:].astype(jnp.float32)

    a = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    a = a + b1_ref[:].astype(jnp.float32)
    hh = _gelu(a).astype(x.dtype)

    # dh = g @ w2^T ; da = dh * gelu'(a)
    dh = jax.lax.dot_general(
        g.astype(x.dtype), w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    da = dh * _gelu_grad(a)
    da_c = da.astype(x.dtype)

    dx = jax.lax.dot_general(
        da_c, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[:] = dx.astype(dx_ref.dtype)

    dw1_t = jax.lax.dot_general(
        x, da_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (C, H)
    dw2_t = jax.lax.dot_general(
        hh, g.astype(x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, C)
    db1_t = jnp.sum(da, axis=0, keepdims=True)
    db2_t = jnp.sum(g, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[:] = dw1_t
        db1_ref[:] = db1_t
        dw2_ref[:] = dw2_t
        db2_ref[:] = db2_t

    @pl.when(pl.program_id(0) != 0)
    def _accum():
        dw1_ref[:] += dw1_t
        db1_ref[:] += db1_t
        dw2_ref[:] += dw2_t
        db2_ref[:] += db2_t


def _backward(x, w1, b1, w2, b2, g):
    m, c = x.shape
    h = w1.shape[1]
    tm = pick_tile(m, 512)
    assert tm, f"unsupported row count {m} for the fused MLP backward"
    row_spec = pl.BlockSpec((tm, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel,
        grid=(m // tm,),
        in_specs=[
            row_spec,                 # x
            row_spec,                 # g
            _full_spec(c, h),         # w1
            _full_spec(1, h),         # b1
            _full_spec(h, c),         # w2
        ],
        out_specs=(
            row_spec,
            _full_spec(c, h),
            _full_spec(1, h),
            _full_spec(h, c),
            _full_spec(1, c),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, c), x.dtype),
            jax.ShapeDtypeStruct((c, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((h, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        interpret=_needs_interpret(),
    )(x, g, w1, b1.reshape(1, h), w2)
    return (
        dx,
        dw1.astype(w1.dtype),
        db1.reshape(h).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(c).astype(b2.dtype),
    )


@jax.custom_vjp
def fused_mlp(x, w1, b1, w2, b2):
    """gelu_exact(x @ w1 + b1) @ w2 + b2, fused in VMEM.

    x: (M, C); w1: (C, H); b1: (H,); w2: (H, C); b2: (C,).
    M must satisfy :func:`supported` (the caller falls back to XLA
    otherwise). Differentiable via a fused backward kernel.
    """
    return _forward(x, w1, b1, w2, b2)


def _fused_fwd(x, w1, b1, w2, b2):
    return _forward(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _fused_bwd(residuals, g):
    x, w1, b1, w2, b2 = residuals
    return _backward(x, w1, b1, w2, b2, g)


fused_mlp.defvjp(_fused_fwd, _fused_bwd)
