from semicp.register.em_icp import (  # noqa: F401
    align, AlignResult, make_align_fn, make_robust_align_fn,
)
from semicp.register.gicp import align_gicp  # noqa: F401
