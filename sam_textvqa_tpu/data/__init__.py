from .vocab import VocabDict, SpecialIds  # noqa: F401
