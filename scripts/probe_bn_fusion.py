"""Where do the backbone's non-matmul milliseconds go?

The ResNeXt50-32x4d os8 backbone at 1440x1920 executes ~2.17 TFLOP of
(tile-diagonal inflated) matmul work per frame = ~11.0 ms at the v5e's
197 TFLOP/s bf16 peak, but measures 26.8 ms (scripts/profile_pipeline.py,
ROUND_NOTES r03).  This probe localizes the other ~16 ms:

  1. a NULL program measuring the tunnel dispatch overhead per scan
     iteration (subtracted from every other row);
  2. per-stage timing of one representative (non-first) block of each
     stage, scaled by block count, vs the measured whole-backbone time;
  3. a conv / conv+BN+ReLU delta microbench — if the delta is ~0, XLA
     already fuses the inference-time BN affine into the conv epilogue
     and BN folding would win nothing;
  4. the compiled HLO kernel schedule of one bottleneck block (op counts
     by kind), to see unfused elementwise passes / relayouts directly.

Methodology (CLAUDE.md + the T=4 postmortem): the block's OUTPUT is
carry-threaded as the next iteration's input (shapes match for non-first
residual blocks), so the scan cannot hoist loop-invariant work and HBM
holds ONE frame; T=64 divides the ~25-40 ms tunnel round-trip down to
~0.5 ms/frame, measured explicitly by the null program.  AOT
lower+compile, host readback barrier, host-numpy closure constants.
"""
import collections
import re
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import flax.linen as nn

sys.path.insert(0, ".")

from vision_semantic_segmentation_tpu.models.resnet import Bottleneck

T = 64
DTYPE = jnp.bfloat16


def carry_time(name, apply_fn, variables, x0, n=3, flops=None, t=T):
    """Time a shape-preserving fn by threading its output as next input."""

    def run_impl(v, x):
        def body(carry, _):
            out = apply_fn(v, carry).astype(carry.dtype)
            return out, ()

        out, _ = jax.lax.scan(body, x, None, length=t)
        return jnp.sum(out.astype(jnp.float32).reshape(-1)[:1])

    run = jax.jit(run_impl).lower(variables, x0).compile()
    _ = float(run(variables, x0))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        acc = run(variables, x0)
        _ = float(acc)
        best = min(best, time.perf_counter() - t0)
    ms = best / t * 1e3
    eff = f"  ({flops / (best / t) / 1e12:6.1f} TFLOP/s)" if flops else ""
    print(f"{name:58s} {ms:8.3f} ms/frame{eff}", flush=True)
    return ms


def null_overhead():
    """Dispatch round-trip per frame at T (subtract from every row)."""
    x = jnp.zeros((8, 128), jnp.float32)
    return carry_time("NULL (dispatch overhead / T)", lambda v, xi: xi + 1.0,
                      {}, x)


def stage_blocks(ovh):
    """One representative non-first block per stage at deployed shapes."""
    rng = np.random.default_rng(0)
    specs = [
        # (name, in_shape, planes, dilation, n_like_blocks_in_stage)
        ("layer1 block (360x480, w128)", (360, 480, 256), 64, 1, 3),
        ("layer2 block (180x240, w256)", (180, 240, 512), 128, 1, 4),
        ("layer3 block (180x240, w512, d2)", (180, 240, 1024), 256, 2, 6),
        ("layer4 block (180x240, w1024, d4)", (180, 240, 2048), 512, 4, 3),
    ]
    total = 0.0
    for name, shape, planes, dilation, n_like in specs:
        blk = Bottleneck(planes=planes, dilation=dilation, groups=32,
                         base_width=4, dtype=DTYPE)
        x = jnp.asarray(rng.standard_normal((1, *shape)).astype(np.float32))
        v = blk.init(jax.random.PRNGKey(0), x, train=False)
        ms = carry_time(name, lambda v, xi, b=blk: b.apply(v, xi, train=False),
                        v, x) - ovh
        total += ms * n_like  # first block of each stage ~= same spatial cost
    print(f"{'sum over 16 blocks (approx, excl. stem, ovh-corrected)':58s} "
          f"{total:8.2f} ms/frame")


def bn_delta(ovh):
    """conv vs conv+BN+ReLU, shape-preserving so the carry threads."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.standard_normal((1, 180, 240, 512)).astype(np.float32)
    ).astype(DTYPE)

    class Pointwise(nn.Module):
        bn: bool = False

        @nn.compact
        def __call__(self, x):
            h = nn.Conv(512, (1, 1), use_bias=False, dtype=DTYPE)(x)
            if self.bn:
                h = nn.BatchNorm(use_running_average=True, dtype=DTYPE)(h)
                h = nn.relu(h)
            return h

    flops = 2 * 180 * 240 * 512 * 512
    for name, mod in [("1x1 512->512 conv only", Pointwise(False)),
                      ("1x1 512->512 conv+BN+ReLU", Pointwise(True))]:
        v = mod.init(jax.random.PRNGKey(0), x)
        ms = carry_time(name, lambda v, xi, m=mod: m.apply(v, xi), v, x,
                        flops=flops)
        print(f"{'':58s} {ms - ovh:8.3f} ms compute", flush=True)

    # the grouped-conv tile at layer4 shape: dense 128->128 3x3 d4
    xg = jnp.asarray(
        rng.standard_normal((1, 180, 240, 128)).astype(np.float32)
    ).astype(DTYPE)

    class Tile(nn.Module):
        bn: bool = False

        @nn.compact
        def __call__(self, x):
            h = nn.Conv(128, (3, 3), padding=((4, 4), (4, 4)),
                        kernel_dilation=(4, 4), use_bias=False, dtype=DTYPE)(x)
            if self.bn:
                h = nn.BatchNorm(use_running_average=True, dtype=DTYPE)(h)
                h = nn.relu(h)
            return h

    gflops = 2 * 180 * 240 * 128 * 128 * 9
    for name, mod in [("3x3d4 128->128 tile conv only", Tile(False)),
                      ("3x3d4 128->128 tile conv+BN+ReLU", Tile(True))]:
        v = mod.init(jax.random.PRNGKey(0), xg)
        ms = carry_time(name, lambda v, xi, m=mod: m.apply(v, xi), v, xg,
                        flops=gflops)
        print(f"{'':58s} {ms - ovh:8.3f} ms compute", flush=True)


def hlo_schedule():
    """Kernel-kind counts of one compiled layer3 bottleneck block."""
    rng = np.random.default_rng(2)
    blk = Bottleneck(planes=256, dilation=2, groups=32, base_width=4, dtype=DTYPE)
    x = jnp.asarray(rng.standard_normal((1, 180, 240, 1024)).astype(np.float32))
    v = blk.init(jax.random.PRNGKey(0), x, train=False)
    compiled = jax.jit(
        lambda v, xi: blk.apply(v, xi, train=False)
    ).lower(v, x).compile()
    txt = compiled.as_text()
    kinds = collections.Counter()
    for m in re.finditer(r"= [\w\[\]{}, /]+? (\w+)\(", txt):
        kinds[m.group(1)] += 1
    print("\ncompiled layer3 block, HLO op kinds (all):")
    for k, c in kinds.most_common(24):
        print(f"  {k:28s} {c}")
    fkinds = collections.Counter(re.findall(r"kind=(\w+)", txt))
    print("fusion kinds:", dict(fkinds))
    convs = len(re.findall(r" convolution\(", txt))
    copies = len(re.findall(r" copy\(", txt))
    print(f"convolution ops: {convs}  copy ops: {copies}")


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}  T={T}")
    ovh = null_overhead()
    bn_delta(ovh)
    stage_blocks(ovh)
    hlo_schedule()
