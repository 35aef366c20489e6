from . import attention, conv, norm, pe, resample  # noqa: F401
