from .joins import asof_join  # noqa: F401
from .topk import topk_per_group  # noqa: F401
