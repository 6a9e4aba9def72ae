from .phoc import build_phoc  # noqa: F401
from .spatial_graph import (  # noqa: F401
    build_spatial_graph,
    relation_head_lut,
    spatial_head_mask_from_classes,
)
