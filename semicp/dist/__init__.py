from semicp.dist.mesh import make_mesh, default_mesh  # noqa: F401
from semicp.dist.batch import batched_align  # noqa: F401
