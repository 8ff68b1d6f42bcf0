"""TPU-friendly LSD radix sort for bounded non-negative int32 keys.

XLA lowers ``jnp.sort`` on TPU to a bitonic network — O(n log^2 n)
comparisons with log^2 n serialized stages.  The grid update's fast path
(mapping/engine.py::_dense_update_dedupe_fast) sorts 2^17 packed keys
bounded by ``2 * cells * classes`` (< 2^26 at the 2000^2 headline grid),
so an LSD radix sort does O(n * ceil(bits/4)) work where every per-pass
op is TPU-native:

    digit  = (k >> shift) & 15
    onehot = one_hot(digit, 16)              # (N, 16) f32
    run    = cumsum(onehot, axis=0)          # stable rank within digit
    dst    = offsets[digit] + rank           # a PERMUTATION of [0, N)
    out    = zeros.at[dst].set(k, unique_indices=True)

The scatter destinations are unique by construction (each pass is a
permutation), so TPU's serialized-duplicate-scatter trap does not apply.
Ranks/offsets are computed in f32 — exact for N < 2^24.

Measured on the v5e at the production shape (2^17 keys, 26 bits,
scripts/probe_radix_sort.py): see ROUND_NOTES — this module ships as an
opt-in (``SemanticMappingEngine.sort_method = 'radix'``) until the probe
picks a winner on real hardware.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["radix_sort", "radix_sort_with_perm"]


def _check_args(keys: jax.Array, digit_bits: int) -> None:
    if keys.ndim != 1:
        raise ValueError(f"radix sort expects a 1-D array, got {keys.shape}")
    if keys.shape[0] >= 1 << 24:
        raise ValueError(
            f"n={keys.shape[0]} overflows exact f32 rank arithmetic (2^24)"
        )
    if not 1 <= digit_bits <= 8:
        raise ValueError(f"digit_bits must be in [1, 8], got {digit_bits}")


def _pass_dst(keys: jax.Array, shift: int, radix: int) -> jax.Array:
    """Stable per-pass scatter destinations (a permutation of [0, n))."""
    digit = (keys >> shift) & (radix - 1)
    oh = jax.nn.one_hot(digit, radix, dtype=jnp.float32)
    run = jnp.cumsum(oh, axis=0)
    counts = run[-1]
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.cumsum(counts)[:-1]]
    )
    rank = jnp.sum(run * oh, axis=1) - 1.0
    return (offsets[digit] + rank).astype(jnp.int32)


def radix_sort(keys: jax.Array, key_bits: int, digit_bits: int = 4) -> jax.Array:
    """Sort 1-D non-negative int32 ``keys`` < ``2**key_bits`` ascending.

    Pure values sort (no permutation output) — the engine's packed-key
    dedupe path only needs sorted values.  ``key_bits``/``digit_bits``
    must be static; ``ceil(key_bits / digit_bits)`` passes run.
    """
    _check_args(keys, digit_bits)
    radix = 1 << digit_bits
    for shift in range(0, key_bits, digit_bits):
        dst = _pass_dst(keys, shift, radix)
        keys = jnp.zeros_like(keys).at[dst].set(keys, unique_indices=True)
    return keys


def radix_sort_with_perm(
    keys: jax.Array, key_bits: int, digit_bits: int = 4
) -> tuple:
    """Stable (sorted_keys, argsort_permutation) — radix twin of
    ``order = jnp.argsort(key); ksort = key[order]`` in the engine's
    general update path.  LSD radix is stable, and ``jnp.argsort``
    defaults to a stable sort, so the permutation matches it exactly
    even across duplicate keys."""
    _check_args(keys, digit_bits)
    radix = 1 << digit_bits
    perm = jnp.arange(keys.shape[0], dtype=jnp.int32)
    for shift in range(0, key_bits, digit_bits):
        dst = _pass_dst(keys, shift, radix)
        keys = jnp.zeros_like(keys).at[dst].set(keys, unique_indices=True)
        perm = jnp.zeros_like(perm).at[dst].set(perm, unique_indices=True)
    return keys, perm
