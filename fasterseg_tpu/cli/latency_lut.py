"""CLI: generate the measured latency LUT on the attached TPU.

Equivalent of `python latency/latency_lookup_table.py`
(latency/latency_lookup_table.py:18-113): sweep every searchable op at
every (scale in {8,16,32}, width_in, width_out, stride in {1,2}) combo plus
stem / FFM / head entries at the 1024x2048 base resolution, measure each
standalone (slope method), and persist incrementally.

  python -m fasterseg_tpu.cli.latency_lut --out latency_lut.json
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="latency_lut.json")
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=2048)
    p.add_argument("--Fch", type=int, default=12)
    p.add_argument("--layers", type=int, default=16)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--max-entries", type=int, default=None,
                   help="stop after N new measurements (resumable)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..core.config import WIDTH_MULT_LIST
    from ..core.plan import num_filters
    from ..latency import LatencyLUT
    from ..latency.lut import convnorm_key, ffm_key, head_key, op_key
    from ..latency.measure import slope_time_ms
    from ..ops.conv import ConvNorm
    from ..ops.primitives import make_op
    from ..ops.seg_heads import FeatureFusion, Head
    from ..ops.slimmable import make_divisible

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    lut = LatencyLUT(args.out)
    H, W = args.height, args.width
    rng = jax.random.PRNGKey(0)
    measured = 0

    def measure(name, module, shape, **apply_kw):
        nonlocal measured
        if name in lut:
            return
        x = jnp.zeros(shape, dtype)
        variables = module.init(rng, x, **apply_kw)

        def fwd(x):
            return module.apply(variables, x, **apply_kw)
        # long chains: the remote-tunnel timing noise (~1 ms/fetch) must
        # amortize over enough iterations to resolve sub-0.1 ms ops
        ms = slope_time_ms(fwd, (x,), n1=8, n2=72, reps=2)
        lut.table[name] = max(ms, 1e-3)  # floor: dispatch is never free
        lut.save()
        measured += 1
        print(f"[{len(lut)}] {name} = {ms:.4f} ms", flush=True)

    def done():
        return args.max_entries is not None and measured >= args.max_entries

    # op sweep (latency_lookup_table.py:18-75)
    for scale in (8, 16, 32):
        h, w = H // scale, W // scale
        c_max = num_filters(scale, args.Fch)
        for wi in WIDTH_MULT_LIST:
            c_in = make_divisible(c_max * wi)
            for wo in WIDTH_MULT_LIST:
                for stride in (1, 2):
                    c_out = make_divisible(
                        (c_max * 2 if stride == 2 else c_max) * wo)
                    for op_idx in range(5):
                        if done():
                            lut.save()
                            return lut
                        name = op_key(op_idx, h, w, c_in, c_out, stride)
                        if name in lut:
                            continue
                        if op_idx == 0 and stride == 1 and c_in != c_out:
                            continue  # identity skip requires equal widths
                        cls_c_out = c_out if not (op_idx == 0 and stride == 1) \
                            else c_in
                        measure(name, make_op(op_idx, cls_c_out, stride,
                                              dtype=dtype),
                                (1, h, w, c_in), train=False)

    # stem entries (model_search.py:146-151 geometry, all stem widths)
    for sw in (1.0, 8.0 / 12):
        nf = lambda s: num_filters(s, args.Fch, sw)
        measure(convnorm_key(H, W, 3, nf(2) * 2, 3, 2),
                ConvNorm(nf(2) * 2, kernel_size=3, stride=2, padding=1,
                         dtype=dtype), (1, H, W, 3), train=False)
        measure(op_key(3, H // 2, W // 2, nf(2) * 2, nf(4) * 2, 2),
                make_op(3, nf(4) * 2, 2, dtype=dtype),
                (1, H // 2, W // 2, nf(2) * 2), train=False)
        measure(op_key(3, H // 4, W // 4, nf(4) * 2, nf(8), 2),
                make_op(3, nf(8), 2, dtype=dtype),
                (1, H // 4, W // 4, nf(4) * 2), train=False)

    # FFM / head / aggregation ConvNorm entries (latency_lookup_table.py:77-113)
    h8, w8 = H // 8, W // 8
    for hw_width in (1.0, 8.0 / 12):
        for branch in (2, 3):
            c = num_filters(8, args.Fch, hw_width) * branch
            measure(ffm_key(h8, w8, c), FeatureFusion(c, dtype=dtype),
                    (1, h8, w8, c), train=False)
            measure(head_key(h8, w8, c, 19), Head(19, dtype=dtype),
                    (1, h8, w8, c), train=False)

    lut.save()
    print(f"LUT complete: {len(lut)} entries -> {args.out}")
    return lut


if __name__ == "__main__":
    main()
