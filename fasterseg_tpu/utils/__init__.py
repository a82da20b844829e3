from .logging import get_logger, MetricWriter, create_exp_dir
from .checkpoint import (
    save_pytree,
    load_pytree,
    save_npz_tree,
    partial_load,
    save_arch,
    load_arch,
)
from .visualize import show_img, show_prediction, print_iou, set_img_color
from .plotting import plot_op, plot_path_width
from .torch_import import import_derived_state_dict, import_slim_op_state
from .flops import param_count, conv_flops, op_flops, plan_flops
