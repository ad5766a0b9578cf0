from sph_taichi_tpu.ops.kernels import cubic_kernel, cubic_kernel_derivative
from sph_taichi_tpu.ops.grid import (
    pos_to_cell, flatten_cell, compute_cell_ids, cell_offsets, sort_by_cell)
from sph_taichi_tpu.ops.neighbors import NeighborList, build_neighbor_list
