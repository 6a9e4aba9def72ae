from .sa_m4c import SAM4C, SAM4CParams  # noqa: F401
