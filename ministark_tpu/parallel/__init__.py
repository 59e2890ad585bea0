from .mesh import make_mesh, default_axis
from .ntt_sharded import make_sharded_ntt_fns, sharded_lde

__all__ = ["make_mesh", "default_axis", "make_sharded_ntt_fns", "sharded_lde"]
