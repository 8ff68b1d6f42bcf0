"""Roofline model of the ResNeXt50-32x4d os8 backbone at 1440x1920 (v5e).

Computes, per conv in the deployed backbone (tile-diagonal grouped convs
as actually executed — models/layers.py::BlockDiagGroupedConv), the
as-executed MXU FLOPs and the minimal HBM traffic (bf16 activations
in + out + weights, assuming XLA fuses every BN/ReLU/residual epilogue —
measured true in probe_bn_fusion.py), and the per-conv roofline time
max(flops / MXU_PEAK, bytes / HBM_BW).  Sums against the measured
whole-backbone time to answer: is the bf16 backbone near its hardware
floor, and which term binds each stage?

Pure host arithmetic — no TPU needed.
"""
V5E_BF16 = 197e12  # MXU peak, flop/s
V5E_INT8 = 394e12
V5E_HBM = 820e9    # bytes/s

H0, W0 = 1440, 1920


def conv_cost(h, w, cin, cout, k=1, itemsize=2, flops_cin=None):
    """(flops, bytes) for a kxk conv at output h x w; flops_cin overrides
    the contraction width (tile-diagonal grouped convs contract 128)."""
    fc = flops_cin if flops_cin is not None else cin
    flops = 2 * h * w * k * k * fc * cout
    bytes_ = itemsize * (h * w * cin + h * w * cout + k * k * fc * cout)
    return flops, bytes_


def block(h, w, cin, width, cout, tiles):
    """One ResNeXt bottleneck: 1x1 cin->width, 3x3 grouped width->width
    executed as `tiles` dense 128->128 convs, 1x1 width->cout."""
    convs = [
        conv_cost(h, w, cin, width),
        # tile-diagonal: per tile a dense 3x3 128->128
        tuple(t * v for t, v in zip((tiles, tiles),
                                    conv_cost(h, w, 128, 128, k=3))),
        conv_cost(h, w, width, cout),
    ]
    return convs


def main():
    specs = []
    # stem: 7x7 s2 3->64 (outputs 720x960), then maxpool to 360x480
    specs.append(("stem", [conv_cost(720, 960, 3, 64, k=7)]))

    h, w = 360, 480
    stages = [
        # (name, n_blocks, h, w, width, cout, tiles)
        ("layer1", 3, 360, 480, 128, 256, 1),
        ("layer2", 4, 180, 240, 256, 512, 2),
        ("layer3", 6, 180, 240, 512, 1024, 4),
        ("layer4", 3, 180, 240, 1024, 2048, 8),
    ]
    cin = 64
    for name, n, h, w, width, cout, tiles in stages:
        convs = []
        for b in range(n):
            convs += block(h, w, cin if b == 0 else cout, width, cout, tiles)
            if b == 0:  # downsample 1x1 cin->cout
                convs.append(conv_cost(h, w, cin, cout))
        specs.append((name, convs))
        cin = cout

    total_f = total_b = total_t = total_tf = total_tb = 0.0
    print(f"{'stage':8s} {'GFLOP':>8s} {'MB':>8s} {'t_mxu ms':>9s} "
          f"{'t_hbm ms':>9s} {'roof ms':>8s} bound")
    for name, convs in specs:
        f = sum(c[0] for c in convs)
        by = sum(c[1] for c in convs)
        tf, tb = f / V5E_BF16, by / V5E_HBM
        t = sum(max(c[0] / V5E_BF16, c[1] / V5E_HBM) for c in convs)
        total_f += f
        total_b += by
        total_t += t
        total_tf += tf
        total_tb += tb
        print(f"{name:8s} {f / 1e9:8.1f} {by / 1e6:8.1f} {tf * 1e3:9.2f} "
              f"{tb * 1e3:9.2f} {t * 1e3:8.2f} "
              f"{'MXU' if tf > tb else 'HBM'}")
    print(f"{'TOTAL':8s} {total_f / 1e9:8.1f} {total_b / 1e6:8.1f} "
          f"{total_tf * 1e3:9.2f} {total_tb * 1e3:9.2f} {total_t * 1e3:8.2f}")
    print(f"\nper-conv roofline sum: {total_t * 1e3:.1f} ms "
          f"(vs 26.8 ms measured whole-backbone -> "
          f"{total_t * 1e3 / 26.8 * 100:.0f}% of roofline)")
    # int8: 2x MXU peak, half the activation/weight bytes
    t8 = 0.0
    for name, convs in specs:
        t8 += sum(max(c[0] / V5E_INT8, c[1] / 2 / V5E_HBM) for c in convs)
    print(f"int8 roofline (2x MXU, half traffic): {t8 * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
