"""Coverage for plots, CLI dispatch, iterer, and commons helpers."""

import numpy as np
import pytest

from pytorch_sound_tpu.utils import iterer
from pytorch_sound_tpu.utils.cli import fire_like
from pytorch_sound_tpu.utils.commons import get_loadable_checkpoint, get_logger
from pytorch_sound_tpu.utils.plots import imshow_to_buf, plot_to_buf


def test_plot_to_buf():
    img = plot_to_buf(np.sin(np.linspace(0, 10, 500)))
    assert img.ndim == 3 and img.shape[0] == 3       # CHW
    assert img.dtype == np.uint8


def test_imshow_to_buf_2d_and_3d():
    x = np.random.default_rng(0).random((80, 100))
    img = imshow_to_buf(x)
    assert img.shape[0] == 3
    img3 = imshow_to_buf(x[None])                    # 3D takes first channel
    assert img3.shape == img.shape


def test_fire_like_function_dispatch():
    def f(a: int, b: str = 'x', flag: bool = False, rate: float = 1.0):
        return (a, b, flag, rate)

    assert fire_like(f, ['3']) == (3, 'x', False, 1.0)
    assert fire_like(f, ['3', 'hello']) == (3, 'hello', False, 1.0)
    assert fire_like(f, ['3', '--flag', 'true', '--rate=0.5']) == (3, 'x', True, 0.5)
    assert fire_like(f, ['3', '--b', 'world']) == (3, 'world', False, 1.0)
    # dashes in flag names map to underscores
    def g(long_name: int = 0):
        return long_name
    assert fire_like(g, ['--long-name=7']) == 7


def test_fire_like_class_dispatch(capsys):
    class Tool:
        def greet(self, name: str, excited: bool = False):
            return 'hi ' + name + ('!' if excited else '')

    assert fire_like(Tool, ['greet', 'bob']) == 'hi bob'
    assert fire_like(Tool, ['greet', 'bob', '--excited', 'true']) == 'hi bob!'
    fire_like(Tool, [])   # help listing
    assert 'greet' in capsys.readouterr().out
    # per-command help prints the signature instead of calling
    assert fire_like(Tool, ['greet', '--help']) is None
    assert 'name: str' in capsys.readouterr().out


def test_iterer_helpers():
    assert iterer.single(5) == (5,)
    assert iterer.double(5) == (5, 5)
    assert iterer.double([1, 2]) == [1, 2]
    it = iterer.repeat([1, 2])
    assert [next(it) for _ in range(5)] == [1, 2, 1, 2, 1]


def test_get_loadable_checkpoint_strips_module_prefix():
    ckpt = {'module.layer.weight': 1, 'plain': 2}
    out = get_loadable_checkpoint(ckpt)
    assert out == {'layer.weight': 1, 'plain': 2}


def test_logger_no_duplicate_handlers():
    a = get_logger('dup_test')
    b = get_logger('dup_test')
    assert a is b and len(a.handlers) == 1


def test_write_wav_multichannel_roundtrip():
    """(channels, T) input must produce a stereo header + interleaved data
    that reads back channel-correct (the round-1 advisory fixed a mono-header
    bug here)."""
    import os
    import tempfile
    import numpy as np
    from pytorch_sound_tpu.utils.wavio import read_wav, read_wav_info, write_wav

    rng = np.random.default_rng(0)
    stereo = (0.3 * rng.standard_normal((2, 500))).astype(np.float32)
    p = os.path.join(tempfile.mkdtemp(), 's.wav')
    write_wav(p, stereo, 22050)
    sr, frames, channels, bits = read_wav_info(p)
    assert (sr, frames, channels) == (22050, 500, 2)
    back, sr2 = read_wav(p)
    assert back.shape == (2, 500)
    np.testing.assert_allclose(back, stereo, atol=1e-6)
