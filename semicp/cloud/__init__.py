from semicp.cloud.cloud import Cloud, make_cloud, pad_to  # noqa: F401
from semicp.cloud.covariance import estimate_covariances, preprocess_cloud  # noqa: F401
