"""Native host runtime: C++ components loaded via ctypes."""

from .host_nms import host_softnms, host_nms, ensure_built  # noqa: F401
