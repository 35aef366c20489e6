from .decode import TestConfig, decode_and_postprocess  # noqa: F401
