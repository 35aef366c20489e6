from .config import (  # noqa: F401
    arch_config_from,
    default_config,
    load_config,
    test_config_from,
)
