from sph_taichi_tpu.models.base import SPHBase
from sph_taichi_tpu.models.wcsph import WCSPHSolver
from sph_taichi_tpu.models.dfsph import DFSPHSolver
