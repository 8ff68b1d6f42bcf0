"""Where do the backbone's non-matmul milliseconds go?

The ResNeXt50-32x4d os8 backbone at 1440x1920 executes ~2.17 TFLOP of
(tile-diagonal inflated) matmul work per frame = ~11.0 ms at the v5e's
197 TFLOP/s peak, but measures 26.8 ms (scripts/profile_pipeline.py,
ROUND_NOTES r03).  This probe localizes the other ~16 ms:

  1. per-stage timing of one representative (non-first) block of each
     stage, scaled by block count, vs the measured whole-backbone time;
  2. a conv / conv+BN+ReLU delta microbench at the layer3 shape — if the
     delta is ~0, XLA already fuses the inference-time BN affine into the
     conv epilogue and BN folding would win nothing;
  3. the compiled HLO kernel schedule of one bottleneck block (op counts
     by kind), to see unfused elementwise passes / relayouts directly.

Methodology per CLAUDE.md: T-frame lax.scan per dispatch, AOT
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

from vision_semantic_segmentation_tpu.models import build_backbone
from vision_semantic_segmentation_tpu.models.resnet import Bottleneck

T = 4
DTYPE = jnp.bfloat16


def scan_time(name, apply_fn, variables, x, n=3, flops=None):
    def run_impl(v, xs):
        def body(acc, frame):
            out = apply_fn(v, frame[None])
            return acc + jnp.sum(out.astype(jnp.float32).reshape(-1)[:1]), ()

        acc, _ = jax.lax.scan(body, jnp.zeros(()), xs)
        return acc

    run = jax.jit(run_impl).lower(variables, x).compile()
    _ = float(run(variables, x))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        acc = run(variables, x)
        _ = float(acc)
        best = min(best, time.perf_counter() - t0)
    ms = best / T * 1e3
    eff = f"  ({flops / (best / T) / 1e12:6.1f} TFLOP/s)" if flops else ""
    print(f"{name:58s} {ms:8.2f} ms/frame{eff}", flush=True)
    return ms


def stage_blocks():
    """One representative non-first block per stage at deployed shapes."""
    rng = np.random.default_rng(0)
    specs = [
        # (name, in_shape, planes, dilation, n_blocks_of_this_kind)
        ("layer1 block (360x480, w128)", (360, 480, 256), 64, 1, 2),
        ("layer2 block (180x240, w256)", (180, 240, 512), 128, 1, 3),
        ("layer3 block (180x240, w512, d2)", (180, 240, 1024), 256, 2, 5),
        ("layer4 block (180x240, w1024, d4)", (180, 240, 2048), 512, 4, 2),
    ]
    total = 0.0
    for name, shape, planes, dilation, n_like in specs:
        blk = Bottleneck(planes=planes, dilation=dilation, groups=32,
                         base_width=4, dtype=DTYPE)
        x = jnp.asarray(rng.standard_normal((T, *shape)).astype(np.float32))
        v = blk.init(jax.random.PRNGKey(0), x[:1], train=False)
        ms = scan_time(name, lambda v, xi, b=blk: b.apply(v, xi, train=False), v, x)
        total += ms * (n_like + 1)  # first blocks ~= same cost at same spatial
    print(f"{'sum over 16 blocks (approx, excl. stem)':58s} {total:8.2f} ms/frame")


def bn_delta():
    """conv vs conv+BN+ReLU at the layer3 1x1 shape (1024->512, 180x240)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((T, 180, 240, 1024)).astype(np.float32))

    class ConvOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(512, (1, 1), use_bias=False, dtype=DTYPE)(x)

    class ConvBnRelu(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(512, (1, 1), use_bias=False, dtype=DTYPE)(x)
            h = nn.BatchNorm(use_running_average=True, dtype=DTYPE)(h)
            return nn.relu(h)

    flops = 2 * 180 * 240 * 1024 * 512
    for name, mod in [("1x1 1024->512 conv only", ConvOnly()),
                      ("1x1 1024->512 conv+BN+ReLU", ConvBnRelu())]:
        v = mod.init(jax.random.PRNGKey(0), x[:1])
        scan_time(name, lambda v, xi, m=mod: m.apply(v, xi), v, x, flops=flops)

    # the grouped-conv tile at layer4 shape: dense 128->128 3x3 d4
    xg = jnp.asarray(rng.standard_normal((T, 180, 240, 128)).astype(np.float32))

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
        v = mod.init(jax.random.PRNGKey(0), xg[:1])
        scan_time(name, lambda v, xi, m=mod: m.apply(v, xi), v, xg, flops=gflops)


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
    for m in re.finditer(r"^\s*(?:ROOT\s+)?%?[\w.-]+ = [\w\[\]{}, ]+ (\w+)\(", txt, re.M):
        kinds[m.group(1)] += 1
    print("\ncompiled layer3 block, top-level op kinds:")
    for k, c in kinds.most_common(20):
        print(f"  {k:24s} {c}")
    # fusion kinds breakdown
    fkinds = collections.Counter(re.findall(r'kind=(\w+)', txt))
    print("fusion kinds:", dict(fkinds))
    copies = len(re.findall(r" copy\(", txt))
    print("copy ops:", copies)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}")
    bn_delta()
    stage_blocks()
    hlo_schedule()
