from .mesh import make_mesh
from .fit import fit_records_sharded, grid_eval_sharded
