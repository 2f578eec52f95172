"""Compatibility alias: the reference's import path.

Upstream code does ``from models.beta_gate_tacfn import ...`` — this package forwards
to :mod:`hriemo.models`. ``masked_mean`` is wrapped so torch/numpy inputs
coerce (upstream calls it directly on torch tensors).
"""

from hriemo.models.beta_gate_tacfn import BetaGate
from hriemo.models.beta_gate_tacfn import masked_mean as _masked_mean
from hriemo.nn.module import _coerce


def masked_mean(x, mask=None):
    return _masked_mean(_coerce(x), _coerce(mask))
