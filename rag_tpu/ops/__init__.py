from rag_tpu.ops.convbr import (
    init_convbr2d,
    init_convbr3d,
    apply_convbr,
)
from rag_tpu.ops.resize import resize_linear, interp_matrix
from rag_tpu.ops.cost_volume import cost_volume
from rag_tpu.ops.disparity import soft_argmin_disparity
from rag_tpu.ops.cell import init_cell, apply_cell, cell_out_channels
