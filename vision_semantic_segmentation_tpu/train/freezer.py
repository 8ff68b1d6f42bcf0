"""Parameter freezing.

Rebuild of `/root/reference/src/network/core/nn/freezer.py:95-118`
(``freeze_bn``) and the TRAIN.FROZEN_PATTERNS hook (ref config/base.py:133):
in a functional framework freezing is (a) masking the optimizer update for
matching parameters and (b), for BatchNorm, keeping the running statistics
fixed — both expressed as pure transformations.
"""
from __future__ import annotations

import re
from typing import Sequence

import jax
import optax


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def freeze_mask(params, patterns: Sequence[str]):
    """Boolean pytree: True where the parameter path matches any regex."""
    compiled = [re.compile(p) for p in patterns]

    def match(path, _):
        s = _path_str(path)
        return any(c.search(s) for c in compiled)

    return jax.tree_util.tree_map_with_path(match, params)


def bn_mask(params):
    """True for BatchNorm scale/bias leaves (path contains a bn module)."""

    def match(path, _):
        s = _path_str(path)
        return ("bn" in s.split("/") or any(p.startswith("bn") for p in s.split("/"))
                or "downsample_1" in s.split("/"))

    return jax.tree_util.tree_map_with_path(match, params)


def mask_frozen(tx: optax.GradientTransformation, params, patterns: Sequence[str] = (),
                freeze_batchnorm: bool = False) -> optax.GradientTransformation:
    """Wrap a gradient transformation to zero updates for frozen params.

    Equivalent of requires_grad=False (ref freezer.py:108-112) +
    FROZEN_PATTERNS.
    """
    if not patterns and not freeze_batchnorm:
        return tx

    frozen = freeze_mask(params, patterns)
    if freeze_batchnorm:
        bn = bn_mask(params)
        frozen = jax.tree.map(lambda a, b: a or b, frozen, bn)
    trainable = jax.tree.map(lambda f: not f, frozen)
    return optax.chain(
        optax.masked(tx, trainable),
        optax.masked(optax.set_to_zero(), frozen),
    )


def keep_bn_stats_fixed(old_stats, new_stats):
    """BN eval-mode equivalent: discard running-stat updates (ref freezer.py:100-106)."""
    return old_stats
