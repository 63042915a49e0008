"""Loader smoke CLI (parity: `/root/reference/tests/test_voicebank.py`).

    python tests/loaders_smoke/test_voicebank.py <meta_dir>
"""

from tqdm import tqdm

from pytorch_sound_tpu.data.meta.voice_bank import get_datasets


def test_voicebank(meta_dir: str):
    """Build both loaders and iterate every batch; success = no exception."""
    train_loader, valid_loader = get_datasets(meta_dir, 32, 4, 1)
    print('Loop train datasets')
    for _ in tqdm(train_loader):
        pass
    print('Loop valid datasets')
    for _ in tqdm(valid_loader):
        pass


if __name__ == '__main__':
    from pytorch_sound_tpu.utils.cli import fire_like
    fire_like(test_voicebank)
