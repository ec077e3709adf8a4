"""Counter-based dropout bits shared by Pallas kernels and XLA.

``pallas_call`` has no automatic VJP here: the fused block's backward
re-runs a jnp reference (ops/fused_block.py), so a dropout mask drawn
with the hardware PRNG inside the kernel could never be reproduced in
the backward.  Instead the mask is a PURE FUNCTION of (seed, element
index): a murmur3-finalizer hash over uint32 counters, expressible in
both Mosaic and XLA with identical results — the forward kernel and the
jnp backward regenerate bit-identical masks with zero HBM traffic.
"""

from __future__ import annotations

import jax.numpy as jnp

def hash_u32(seed, idx):
    """murmur3 finalizer over (seed, idx) — uint32 in, uint32 out.

    Constants are materialized INSIDE the traced function (a Pallas
    kernel must not close over arrays created outside its trace)."""
    c1 = jnp.uint32(0x85EBCA6B)
    c2 = jnp.uint32(0xC2B2AE35)
    phi = jnp.uint32(0x9E3779B9)
    x = idx.astype(jnp.uint32) * phi + seed.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * c1
    x = x ^ (x >> 13)
    x = x * c2
    x = x ^ (x >> 16)
    return x


def keep_mask(seed, idx, rate: float, dtype=jnp.float32):
    """Inverted-dropout keep mask: 1/(1-rate) where kept, else 0.

    ``idx`` is any integer array of GLOBALLY unique element counters;
    the decision threshold uses the hash's low 24 bits.
    """
    bits = hash_u32(seed, idx) & jnp.uint32(0xFFFFFF)
    threshold = jnp.uint32(int(round(rate * float(1 << 24))))
    keep = (bits >= threshold).astype(dtype)
    return keep / dtype(1.0 - rate)
