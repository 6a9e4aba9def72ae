from .loss import m4c_decoding_bce_with_mask  # noqa: F401
from .optimizer import lr_factor_schedule, make_optimizer  # noqa: F401
