"""CLI: generate the measured latency LUT on the attached TPU.

Equivalent of `python latency/latency_lookup_table.py`
(latency/latency_lookup_table.py:18-113): sweep every searchable op at
every (scale in {8,16,32}, width_in, width_out, stride in {1,2}) combo plus
stem / FFM / head / aggregation-ConvNorm entries at the 1024x2048 base
resolution, measure each standalone (slope method), and persist
incrementally (resumable: existing entries are skipped).

Coverage is provider-driven: the LUT gets a real measurement provider,
then every key the framework can ask for — the full supernet latency
tables, both stem widths, and the complete derived-network walks of the
shipped teacher/student genotypes at both branch pairs — is requested
through the same `get_op`/`get` paths the search uses, so by construction
the finished table leaves zero roofline fallbacks for the reference
geometry. Ops are measured under their TRUE names (BasicResidual_downup_2x
gets its own timing; the reference's 2x-key alias is import-only,
operations.py:426-431).

  python -m fasterseg_tpu.cli.latency_lut --out latency_lut.json
"""

from __future__ import annotations

import argparse
import os


class _Budget(Exception):
    pass


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
    p.add_argument("--arch", nargs="*", default=None,
                   help="genotype .npz files for the coverage pass "
                        "(default: the shipped teacher/student assets)")
    args = p.parse_args(argv)

    from ..utils.logging import enable_compilation_cache
    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from ..core.config import WIDTH_MULT_LIST
    from ..core.genotype import ArchParams, decode_network
    from ..core.plan import build_plan, num_filters
    from ..latency import LatencyLUT
    from ..latency.derived import derived_latency_ms
    from ..latency.measure import measured_provider
    from ..latency.tables import build_supernet_tables, stem_latency_ms
    from ..ops.slimmable import make_divisible

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    lut = LatencyLUT(args.out)
    H, W = args.height, args.width
    base = measured_provider(dtype=dtype)
    count = {"new": 0}

    def provider(name):
        if args.max_entries is not None and count["new"] >= args.max_entries:
            raise _Budget()
        ms = base(name)
        count["new"] += 1
        return ms

    lut.provider = provider
    try:
        # 1. full op sweep, true keys (latency_lookup_table.py:18-75)
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
                            if op_idx == 0 and stride == 1 and c_in != c_out:
                                continue  # identity skip needs equal widths
                            lut.get_op(op_idx, h, w, c_in, c_out, stride)

        # 2. supernet tables + stems for both archs — exactly what the
        # search engine will request (zero-fallback guarantee)
        build_supernet_tables(lut, args.layers, args.Fch, WIDTH_MULT_LIST,
                              (H, W))
        for sw in (1.0, 8.0 / 12):
            stem_latency_ms(lut, args.Fch, sw, (H, W))

        # 3. derived-walk coverage of the shipped genotypes (fills the
        # aggregation ConvNorm / ff / head keys the plans actually use)
        arch_paths = args.arch
        if arch_paths is None:
            assets = os.path.join(os.path.dirname(__file__), "..", "..",
                                  "tests", "assets")
            arch_paths = [os.path.join(assets, f"arch_{i}.npz")
                          for i in (0, 1)]
        for idx, path in enumerate(arch_paths):
            if not os.path.isfile(path):
                print(f"skipping missing genotype {path}")
                continue
            ap = ArchParams.from_npz(path)
            teacher = idx == 0
            shw = (1.0, 1.0) if teacher else (8.0 / 12, 8.0 / 12)
            genos = decode_network(ap, WIDTH_MULT_LIST, args.layers,
                                   ignore_skip=teacher)
            for lasts in ([2, 0], [2, 1]):
                plan = build_plan(genos, lasts, Fch=args.Fch,
                                  num_classes=19, stem_head_width=shw)
                ms = derived_latency_ms(lut, plan, (H, W))
                print(f"arch {idx} lasts={lasts}: {ms:.3f} ms "
                      f"({1000.0 / ms:.1f} FPS)")
    except _Budget:
        print(f"budget reached: {count['new']} new entries")

    lut.save()
    print(f"LUT: {len(lut)} entries ({count['new']} new) -> {args.out}")
    return lut


if __name__ == "__main__":
    main()
