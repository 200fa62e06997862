from semicp.corr.hashgrid import (  # noqa: F401
    HashGrid,
    build_grid,
    query_nn,
    query_knn,
    GRID_DIMS,
)
