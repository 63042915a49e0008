"""Loader smoke CLI (parity: `/root/reference/tests/test_dsd100.py`).

    python tests/loaders_smoke/test_dsd100.py <meta_dir>
"""

from tqdm import tqdm

from pytorch_sound_tpu.data.meta.dsd100 import get_datasets


def test_dsd100(meta_dir: str):
    """Build both loaders and iterate every batch; success = no exception."""
    train_loader, valid_loader = get_datasets(meta_dir, 4, 4, 1)
    print('Loop train datasets')
    for _ in tqdm(train_loader):
        pass
    print('Loop valid datasets')
    for _ in tqdm(valid_loader):
        pass
    print('All of the dataset is loaded successfully.')


if __name__ == '__main__':
    from pytorch_sound_tpu.utils.cli import fire_like
    fire_like(test_dsd100)
