from . import mel  # noqa: F401
from .byola import AudioNTT2020, byola_features  # noqa: F401
