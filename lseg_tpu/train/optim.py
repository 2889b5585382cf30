"""Optimizer policy — optax port of the reference recipe.

Reference (modules/lsegmentation_module.py:119-175):
- base_lr is pre-scaled `base_lr / 16 * batch_size` (lsegmentation_module.py:32)
- SGD momentum 0.9, weight_decay 1e-4
- per-group LR multipliers: backbone (`pretrained`) 1×, decoder heads
  (`scratch`, `auxlayer`, `scaleinv` layers) 10×
- poly LR decay `(1 - epoch/max_epochs) ** 0.9`, stepped per epoch
- optional Adam "midasproto" proto (lr, betas default) with the same groups
- optional frozen backbone (ZS finetune_mode, lsegmentation_module_zs.py:218-235)

In lseg_tpu the backbone lives under params['vit'] / params['resnet'] /
params['clip_*'] and everything else (reassemble, scratch, refinenet, head1,
head_block) is "decoder" — the 10× group.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax


BACKBONE_KEYS = ("vit", "resnet")


def poly_schedule(
    base_lr: float, max_steps: int, power: float = 0.9
) -> Callable[[Any], Any]:
    """(1 - step/max_steps) ** power, as the reference's per-epoch poly
    LambdaLR (lsegmentation_module.py:166-174) generalized to steps."""

    def sched(step):
        import jax.numpy as jnp

        frac = jnp.minimum(step / max_steps, 1.0)
        return base_lr * (1.0 - frac) ** power

    return sched


def _group_label_tree(params) -> Any:
    """Label each leaf 'backbone' or 'decoder' by its top-level key."""

    def label_subtree(key, sub):
        lbl = "backbone" if key in BACKBONE_KEYS else "decoder"
        return jax.tree_util.tree_map(lambda _: lbl, sub)

    return {k: label_subtree(k, v) for k, v in params.items()}


def make_optimizer(
    base_lr: float,
    max_steps: int,
    *,
    batch_size: int = 16,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    head_lr_mult: float = 10.0,
    power: float = 0.9,
    midas_proto: bool = False,
    freeze_backbone: bool = False,
    params_example: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Build the reference's optimizer: grouped SGD+poly (or Adam when
    `midas_proto`), with the decoder at `head_lr_mult` × backbone LR.

    `base_lr` here is the CLI base_lr; the reference's batch scaling
    `base_lr/16*batch_size` is applied internally."""
    lr = base_lr / 16.0 * batch_size
    sched = poly_schedule(lr, max_steps, power)

    def group_tx(mult: float, frozen: bool) -> optax.GradientTransformation:
        if frozen:
            return optax.set_to_zero()
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        if midas_proto:
            chain.append(optax.scale_by_adam())
        else:
            chain.append(optax.trace(decay=momentum, nesterov=False))
        chain.append(optax.scale_by_schedule(sched))
        chain.append(optax.scale(-mult))
        return optax.chain(*chain)

    return optax.multi_transform(
        {
            "backbone": group_tx(1.0, freeze_backbone),
            "decoder": group_tx(head_lr_mult, False),
        },
        _group_label_tree,
    )
