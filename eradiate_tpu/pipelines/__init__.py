from .logic import postprocess_measure  # noqa: F401
