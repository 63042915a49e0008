"""Model construction helpers.

Parity target: `/root/reference/pytorch_sound/utils/training.py:6-14` — the
inspect-based kwarg filter that `build_model` uses to pass only the arguments a
model class actually accepts.
"""

import inspect
from typing import Any, Dict


def parse_model_kwargs(model_cls, **kwargs) -> Dict[str, Any]:
    """Filter ``kwargs`` down to the parameter names accepted by ``model_cls``.

    Works with plain classes, dataclasses, and flax ``nn.Module`` subclasses
    (whose constructor signature comes from their dataclass fields).
    """
    try:
        accepted = set(inspect.signature(model_cls).parameters)
    except (TypeError, ValueError):
        accepted = set(inspect.getfullargspec(model_cls.__init__).args)
    return {k: v for k, v in kwargs.items() if k in accepted}
