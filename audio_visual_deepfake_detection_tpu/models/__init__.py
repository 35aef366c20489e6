from .meta_arch import (  # noqa: F401
    ArchConfig,
    AVLocalizer,
    compute_losses,
    label_points,
    model_points,
    update_loss_normalizer,
)
