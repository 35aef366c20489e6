"""Losses: sigmoid focal and center-DIoU (reference: libs/modeling/losses.py).

Both are elementwise/vectorized jnp — weighting and masking are applied by the
caller so everything stays static-shaped under jit (no boolean gathers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Elementwise focal loss (losses.py:5-53). Caller reduces."""
    inputs = inputs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(inputs)
    # bce with logits, numerically stable
    ce = jnp.maximum(inputs, 0) - inputs * targets + jnp.log1p(jnp.exp(-jnp.abs(inputs)))
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def ctr_diou_loss_1d(
    input_offsets: jnp.ndarray,
    target_offsets: jnp.ndarray,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Elementwise 1-D distance-IoU loss on (left, right) offsets sharing a
    center (losses.py:57-117). Shapes (..., 2) -> (...)."""
    inp = input_offsets.astype(jnp.float32)
    tgt = target_offsets.astype(jnp.float32)
    lp, rp = inp[..., 0], inp[..., 1]
    lg, rg = tgt[..., 0], tgt[..., 1]

    lkis = jnp.minimum(lp, lg)
    rkis = jnp.minimum(rp, rg)
    intsct = rkis + lkis
    union = (lp + rp) + (lg + rg) - intsct
    iou = intsct / jnp.maximum(union, eps)

    lc = jnp.maximum(lp, lg)
    rc = jnp.maximum(rp, rg)
    len_c = lc + rc
    rho = 0.5 * (rp - lp - rg + lg)
    return 1.0 - iou + jnp.square(rho / jnp.maximum(len_c, eps))
