"""Inference interfaces: the wav <-> feature <-> wav contract.

API parity target: `/root/reference/pytorch_sound/interface/__init__.py` —
an ``Interface`` exposes ``encode`` (wave -> model features) and ``decode``
(features -> wave); concrete implementations bundle their models and
checkpoints (see :mod:`pytorch_sound_tpu.interface.hifi_gan`).
"""

import abc


class Interface(abc.ABC):
    """Base contract between raw waveforms and a model's feature space.

    Subclasses jit-compile their encode/decode paths and manage parameters
    internally, so callers see plain array-in/array-out methods.
    """

    @abc.abstractmethod
    def encode(self, *args, **kwargs):
        """Waveform(s) -> model features."""
        raise NotImplementedError()

    @abc.abstractmethod
    def decode(self, *args, **kwargs):
        """Model features -> waveform(s)."""
        raise NotImplementedError()

    def __repr__(self) -> str:
        return '{}()'.format(type(self).__name__)
