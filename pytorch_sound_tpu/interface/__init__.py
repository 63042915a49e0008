"""Abstract wav <-> feature interface.

Parity target: `/root/reference/pytorch_sound/interface/__init__.py`.
"""

import abc


class Interface:
    """Defines the interface between 'wav' and 'model'."""

    @abc.abstractmethod
    def encode(self, *args, **kwargs):
        raise NotImplementedError()

    @abc.abstractmethod
    def decode(self, *args, **kwargs):
        raise NotImplementedError()
