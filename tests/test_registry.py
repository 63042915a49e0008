"""Registry semantics tests (parity: reference models/__init__.py behavior)."""

import pytest

from pytorch_sound_tpu.models import (ARCH_CONFIG_REGISTRY, ARCH_MODEL_REGISTRY,
                                      MODEL_REGISTRY, build_model, register_model,
                                      register_model_architecture)


@register_model('toy_model')
class ToyModel:
    def __init__(self, hidden: int = 8, depth: int = 1):
        self.hidden = hidden
        self.depth = depth


@register_model_architecture('toy_model', 'toy_model_base')
def toy_model_base():
    return {'hidden': 16, 'depth': 2, 'unknown_key_ignored': 99}


def test_registries_populated():
    assert MODEL_REGISTRY['toy_model'] is ToyModel
    assert ARCH_MODEL_REGISTRY['toy_model_base'] is ToyModel
    assert ARCH_CONFIG_REGISTRY['toy_model_base']()['hidden'] == 16


def test_build_model_filters_unknown_kwargs():
    m = build_model('toy_model_base')
    assert (m.hidden, m.depth) == (16, 2)


def test_build_model_extra_kwargs_only_known_keys():
    m = build_model('toy_model_base', extra_kwargs={'hidden': 32, 'not_a_key': 1})
    assert m.hidden == 32
    assert m.depth == 2


def test_duplicate_registration_raises():
    with pytest.raises(ValueError):
        register_model('toy_model')(ToyModel)
    with pytest.raises(ValueError):
        register_model_architecture('toy_model', 'toy_model_base')(lambda: {})
    with pytest.raises(ValueError):
        register_model_architecture('missing_model', 'x')(lambda: {})
