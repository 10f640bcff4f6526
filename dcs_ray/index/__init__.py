from dcs_ray.index.config import IndexConfig  # noqa: F401
from dcs_ray.index.build import build_index  # noqa: F401
