"""fairseq-style model registry.

API parity target: `/root/reference/pytorch_sound/models/__init__.py:9-85`.
The registry maps model names to classes and architecture names to
(class, config-fn) pairs; ``build_model`` instantiates an architecture by name
with optional keyword overrides restricted to keys the config already defines.

Here "model class" is typically a flax ``nn.Module`` subclass: ``build_model``
returns the *module* (hyperparameters bound); parameters are created separately
via ``module.init(rng, ...)`` in keeping with JAX's functional state handling.
"""

from typing import Any, Callable, Dict

from pytorch_sound_tpu.utils.training import parse_model_kwargs

MODEL_REGISTRY: Dict[str, type] = {}
ARCH_MODEL_REGISTRY: Dict[str, type] = {}
ARCH_MODEL_INV_REGISTRY: Dict[str, list] = {}
ARCH_CONFIG_REGISTRY: Dict[str, Callable[[], Dict[str, Any]]] = {}


def build_model(arch_name: str, extra_kwargs: Dict[str, Any] = None):
    """Instantiate the model registered under ``arch_name``.

    The architecture's config function supplies constructor kwargs (filtered to
    those the class accepts); ``extra_kwargs`` may override values **only for
    keys already present** in the config — unknown keys are silently ignored,
    matching the reference behavior.

    Registration must happen (module imported) before calling this.
    """
    cls = ARCH_MODEL_REGISTRY[arch_name]
    kwargs = parse_model_kwargs(cls, **ARCH_CONFIG_REGISTRY[arch_name]())
    if extra_kwargs:
        for key, val in extra_kwargs.items():
            if key in kwargs:
                kwargs[key] = val
    return cls(**kwargs)


def register_model(name: str) -> Callable:
    """Class decorator adding a model class to ``MODEL_REGISTRY``::

        @register_model('lstm')
        class LSTM(nn.Module):
            ...
    """

    def register_model_cls(cls):
        if name in MODEL_REGISTRY:
            raise ValueError('Cannot register duplicate model ({})'.format(name))
        MODEL_REGISTRY[name] = cls
        return cls

    return register_model_cls


def register_model_architecture(model_name: str, arch_name: str) -> Callable:
    """Function decorator adding a named hyperparameter set for a registered
    model::

        @register_model_architecture('lstm', 'lstm_small')
        def lstm_small():
            return {'hidden': 128}
    """

    def register_model_arch_fn(fn):
        if model_name not in MODEL_REGISTRY:
            raise ValueError(
                'Cannot register model architecture for unknown model type ({})'.format(model_name))
        if arch_name in ARCH_MODEL_REGISTRY:
            raise ValueError('Cannot register duplicate model architecture ({})'.format(arch_name))
        if not callable(fn):
            raise ValueError('Model architecture must be callable ({})'.format(arch_name))
        ARCH_MODEL_REGISTRY[arch_name] = MODEL_REGISTRY[model_name]
        ARCH_MODEL_INV_REGISTRY.setdefault(model_name, []).append(arch_name)
        ARCH_CONFIG_REGISTRY[arch_name] = fn
        return fn

    return register_model_arch_fn
