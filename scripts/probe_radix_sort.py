"""Radix sort vs XLA comparison sort at the grid-update production shape.

The dense-update fast path sorts 2^17 packed int32 keys
(cell_index*2 | boost, < 2^23) per frame; the sort is the largest piece
of the 11.8 ms update (probe_update_breakdown.py: 3.4 ms argsort, ~2.5-3
for the values-only sort).  XLA lowers jnp.sort to a bitonic network —
O(n log^2 n) comparisons.  An LSD radix sort does O(n * passes) work and
every per-pass op is TPU-friendly:

    digit  = (k >> shift) & 15
    onehot = one_hot(digit, 16)             # (N, 16)
    run    = cumsum(onehot, axis=0)         # stable rank within digit
    dst    = offsets[digit] + rank          # a PERMUTATION
    out    = zeros.at[dst].set(k, unique_indices=True)

The scatter destinations are unique by construction, so the TPU's
serialized-duplicate-scatter trap does not apply.  f32 cumsum is exact
up to 2^24 > N.  6 passes x 4 bits cover the 23-24 bit key range.

Methodology: T=16 carry-threaded scans, NULL subtracted (CLAUDE.md).
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

sys.path.insert(0, ".")

T = 16
N = 1 << 17
# headline grid: 2000*2000 cells * 5 classes * 2 (boost bit) ~ 4e7 -> 26 bits
KEY_BITS = 26


from vision_semantic_segmentation_tpu.ops.sort import radix_sort  # noqa: E402


def scan_program(step):
    def body(carry, _):
        out = step(carry)
        return jnp.float32(jnp.sum(out) * 1e-9) + carry * 0.0, ()

    def run(seed):
        final, _ = jax.lax.scan(body, seed, None, length=T)
        return final

    return run


def timed(run, n=3):
    out = run(jnp.float32(0.0))
    _ = float(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = run(jnp.float32(0.0))
        _ = float(out)
        best = min(best, time.perf_counter() - t0)
    return best / T * 1e3


def main():
    print(f"device: {jax.devices()[0].device_kind}  N={N}, {KEY_BITS}-bit keys, T={T}")
    rng = np.random.default_rng(0)
    # host-numpy closure: embeds into the module for free (CLAUDE.md)
    keys = rng.integers(0, 1 << KEY_BITS, N).astype(np.int32)
    keys_np = keys

    # correctness first (single dispatch)
    got = np.asarray(jax.jit(lambda k: radix_sort(k, KEY_BITS)).lower(keys).compile()(keys))
    np.testing.assert_array_equal(got, np.sort(keys_np))
    print("radix == np.sort: OK")

    null = jax.jit(scan_program(lambda c: c)).lower(jnp.float32(0.0)).compile()
    null_ms = timed(null)

    def xla_step(c):
        return jnp.sort(keys + jnp.int32(c * 0.0)).astype(jnp.float32)

    def radix_step(c):
        return radix_sort(keys + jnp.int32(c * 0.0), KEY_BITS).astype(jnp.float32)

    for name, step in (("jnp.sort (bitonic)", xla_step), ("radix 6x4bit", radix_step)):
        run = jax.jit(scan_program(step)).lower(jnp.float32(0.0)).compile()
        ms = timed(run) - null_ms
        print(f"{name:24s} {ms:7.3f} ms")

    # digit-width sweep: fewer wider passes trade cumsum width for count
    for db in (2, 8):
        def step(c, db=db):
            return radix_sort(keys + jnp.int32(c * 0.0), KEY_BITS, digit_bits=db).astype(jnp.float32)

        run = jax.jit(scan_program(step)).lower(jnp.float32(0.0)).compile()
        ms = timed(run) - null_ms
        print(f"radix {KEY_BITS // db}x{db}bit{'':14s} {ms:7.3f} ms")


if __name__ == "__main__":
    main()
