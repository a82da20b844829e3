from .derived import DerivedNet, Stem, create_derived
from .supernet import Supernet, ArchParamsPytree, SlimMixedOp, SlimCell, init_supernet
from .infer import InferenceRunner, fast_stem


def student_plan(assets_dir: str = None, arch_npz: str = None):
    """Convenience: decode the shipped student genotype into a NetworkPlan.

    Loads the arch_1 tensors (from tests/assets by default), decodes with
    the student width list / stem-head width (config_train.py:95-104), and
    selects branches by the stored search-time objective."""
    import os
    import numpy as np
    from ..core import ArchParams, decode_network, build_plan, WIDTH_MULT_LIST
    from ..core.plan import select_lasts

    if arch_npz is None:
        base = assets_dir or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            "tests", "assets")
        arch_npz = os.path.join(base, "arch_1.npz")
    d = np.load(arch_npz)
    arch = ArchParams.from_npz(arch_npz)
    genos = decode_network(arch, WIDTH_MULT_LIST, layers=16,
                           ignore_skip=False)
    lasts = select_lasts(float(d["mIoU02"]), float(d["latency02"]),
                         float(d["mIoU12"]), float(d["latency12"]))
    return build_plan(genos, lasts, Fch=12, num_classes=19,
                      stem_head_width=(8.0 / 12, 8.0 / 12))


def teacher_plan(assets_dir: str = None, arch_npz: str = None):
    """Decode the shipped teacher genotype (arch_0, ignore_skip=True)."""
    import os
    import numpy as np
    from ..core import ArchParams, decode_network, build_plan, WIDTH_MULT_LIST
    from ..core.plan import select_lasts

    if arch_npz is None:
        base = assets_dir or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            "tests", "assets")
        arch_npz = os.path.join(base, "arch_0.npz")
    d = np.load(arch_npz)
    arch = ArchParams.from_npz(arch_npz)
    genos = decode_network(arch, WIDTH_MULT_LIST, layers=16,
                           ignore_skip=True)
    lasts = select_lasts(float(d["mIoU02"]), float(d["latency02"]),
                         float(d["mIoU12"]), float(d["latency12"]))
    return build_plan(genos, lasts, Fch=12, num_classes=19,
                      stem_head_width=(1.0, 1.0))
