from semicp.oracle.numpy_icp import (  # noqa: F401
    OracleParams,
    estimate_covariances_np,
    semantic_icp_np,
)
