"""A deliberately tiny functional module system.

Design goals (why not flax):
  * Parameters live in plain nested dicts whose key paths are *identical*
    to the PyTorch reference's ``state_dict()`` names (e.g.
    ``cross_modal.layers.0.self_attn_a.in_proj_weight``). This makes the
    torch checkpoint bridge (hriemo.utils.checkpoint) a pure name-preserving
    tensor convert with no renaming table to maintain.
  * ``apply`` is a pure function of ``(params, *inputs)`` — directly
    jit/pjit/grad-able, and the param pytree is directly shardable.
  * A thin stateful convenience layer (``__call__`` on an instance) gives
    torch-like ergonomics for tests and notebooks; training code uses the
    functional form.

Every module implements:
    init(key) -> params          (nested dict of jnp arrays)
    apply(params, *a, **kw)      (pure)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Module:
    """Base class: config container + (init, apply) pair.

    Instances are cheap config objects. ``self.params`` lazily initialises
    a parameter pytree from ``self.seed`` (default 0) so instances can be
    called directly like torch modules:

        model = FusionClassifier(d_model=768)
        logits, beta, pooled = model(h_a, h_t)      # uses model.params

    The functional form is always available and is what training uses:

        params = model.init(jax.random.key(0))
        logits, beta, pooled = model.apply(params, h_a, h_t)
    """

    seed: int = 0
    _params = None

    def init(self, key):  # pragma: no cover - abstract
        raise NotImplementedError

    def apply(self, params, *args, **kwargs):  # pragma: no cover - abstract
        raise NotImplementedError

    @property
    def params(self):
        if self._params is None:
            self._params = self.init(jax.random.key(self.seed))
        return self._params

    @params.setter
    def params(self, value):
        self._params = value

    def __call__(self, *args, **kwargs):
        # coerce torch tensors / numpy arrays so reference-style callers
        # (e.g. the upstream tests/ scripts) work unchanged
        args = tuple(_coerce(a) for a in args)
        kwargs = {k: _coerce(v) for k, v in kwargs.items()}
        return self.apply(self.params, *args, **kwargs)

    # ---- state-dict style access (flat, torch-compatible names) ----

    def state_dict(self):
        return flatten_params(self.params)

    def load_state_dict(self, flat: dict):
        """Load a flat ``name -> array`` dict (e.g. from a torch checkpoint).

        Arrays may be numpy / torch tensors; they are converted to jnp.
        Shapes must match exactly. Missing/unexpected keys raise.
        """
        have = flatten_params(self.params)
        missing = sorted(set(have) - set(flat))
        unexpected = sorted(set(flat) - set(have))
        if missing or unexpected:
            raise KeyError(
                f"state_dict mismatch: missing={missing[:8]} unexpected={unexpected[:8]}"
            )
        new_flat = {}
        for name, ref in have.items():
            arr = _to_jnp(flat[name])
            if tuple(arr.shape) != tuple(ref.shape):
                raise ValueError(
                    f"shape mismatch for {name}: got {arr.shape}, want {ref.shape}"
                )
            new_flat[name] = arr.astype(ref.dtype)
        self._params = unflatten_params(new_flat)
        return self


def _coerce(x):
    """torch.Tensor / np.ndarray → jnp; everything else passes through."""
    if hasattr(x, "detach"):  # torch tensor
        return jnp.asarray(x.detach().cpu().numpy())
    if type(x).__module__ == "numpy" and hasattr(x, "shape"):
        return jnp.asarray(x)
    return x


def _to_jnp(x) -> jnp.ndarray:
    # torch tensors expose .detach().cpu().numpy(); avoid importing torch here.
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return jnp.asarray(x)


def flatten_params(tree: dict, prefix: str = "") -> dict:
    """Nested param dict -> flat ``{"a.b.c": array}`` (torch state_dict style)."""
    out = {}
    for k, v in tree.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_params(v, prefix=name + "."))
        else:
            out[name] = v
    return out


def unflatten_params(flat: dict) -> dict:
    """Inverse of :func:`flatten_params`."""
    tree: dict = {}
    for name, v in flat.items():
        parts = name.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def split_keys(key, n: int):
    return list(jax.random.split(key, n))
