"""VCTK loader smoke CLI (parity: `/root/reference/tests/test_vctk.py`).

    python tests/loaders_smoke/test_vctk.py <meta_dir>
"""

from common import iterate_dataset


def test_vctk(meta_dir: str):
    iterate_dataset('vctk', meta_dir, batch_size=32)


if __name__ == '__main__':
    from pytorch_sound_tpu.utils.cli import fire_like
    fire_like(test_vctk)
