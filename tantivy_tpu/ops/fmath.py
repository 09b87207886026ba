"""Correctly-rounded f32 division for TPU kernels.

TPU hardware divides f32 by reciprocal + Newton refinement, which differs
from IEEE round-to-nearest in ~45% of operand pairs by 1 ulp (measured on
this backend). The host engine (numpy, matching reference `bm25.rs` f32
semantics) rounds exactly, so every device BM25 `tf / (tf + norm)` must be
correctly rounded or device-vs-host top-k can flip on near-ties.

`exact_div` rebuilds the correctly rounded quotient from operations that ARE
exact on the VPU (mul/add/sub, verified bit-exact vs IEEE):

1. `q0 = n / d` (hardware, within ~2 ulp);
2. one Markstein refinement using the *exact* residual `r0 = n - q0*d`,
   where `q0*d` is split into `p + e` exactly via a Dekker/Veltkamp product
   (no FMA on the VPU, so the 4097-split two-product is used) and `n - p`
   is exact by Sterbenz (p is within a factor 2 of n);
3. a 3-candidate correction: among `{q1 - ulp, q1, q1 + ulp}` pick the one
   whose exact residual `|n - q*d|` is smallest.

Round-to-nearest ties (quotient exactly halfway between two f32) cannot
occur for f32 n/d with normal operands — the quotient would need a 25-bit
odd multiple of d's mantissa to equal n's mantissa times a power of two,
which exceeds the 24-bit mantissa range — so no tie-break is needed.
Validated bit-exact against numpy over 4M random (tf, norm) pairs plus the
dense realistic grid in `tests/test_device_ops.py`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Veltkamp split constant for f32 (12|12); a Python float so it lowers as
#: a weak-typed literal inside pallas kernels (a np/jnp scalar would be a
#: captured constant, which pallas_call rejects)
_SPLIT = float(2**12 + 1)


def _two_prod(a, b):
    """(p, e) with a*b = p + e exactly (Dekker two-product, FMA-free)."""
    p = a * b
    ah_ = _SPLIT * a
    ah = ah_ - (ah_ - a)
    al = a - ah
    bh_ = _SPLIT * b
    bh = bh_ - (bh_ - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _abs_residual(q, n, d):
    """|n - q*d| with the product expanded exactly."""
    p, e = _two_prod(q, d)
    return jnp.abs((n - p) - e)


def exact_div(n, d):
    """IEEE round-to-nearest n / d in float32 on hardware whose divide is
    only faithfully rounded. NaN operands propagate."""
    q0 = n / d
    p, e = _two_prod(q0, d)
    r0 = (n - p) - e
    q1 = q0 + r0 / d
    qb = jax.lax.bitcast_convert_type(q1, jnp.int32)
    qm = jax.lax.bitcast_convert_type(qb - 1, jnp.float32)
    qp = jax.lax.bitcast_convert_type(qb + 1, jnp.float32)
    r1 = _abs_residual(q1, n, d)
    rm = _abs_residual(qm, n, d)
    rp = _abs_residual(qp, n, d)
    q = jnp.where(rm < r1, qm, q1)
    rbest = jnp.minimum(rm, r1)
    return jnp.where(rp < rbest, qp, q)
