"""Compatibility alias: the reference's import path.

Upstream code does ``from models.cross_modal_block import CrossModalBlock, CrossModalTransformer`` — this package
forwards to :mod:`hriemo.models` so reference scripts and tests run
unchanged (torch/numpy inputs are coerced by Module.__call__).
"""

from hriemo.models.cross_modal_block import CrossModalBlock, CrossModalTransformer
