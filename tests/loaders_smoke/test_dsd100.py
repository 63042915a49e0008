"""DSD100 loader smoke CLI (parity: `/root/reference/tests/test_dsd100.py`).

    python tests/loaders_smoke/test_dsd100.py <meta_dir>
"""

from common import iterate_dataset


def test_dsd100(meta_dir: str):
    iterate_dataset('dsd100', meta_dir, batch_size=4)


if __name__ == '__main__':
    from pytorch_sound_tpu.utils.cli import fire_like
    fire_like(test_dsd100)
