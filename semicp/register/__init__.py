from semicp.register.em_icp import align, AlignResult, make_align_fn  # noqa: F401
from semicp.register.gicp import align_gicp  # noqa: F401
