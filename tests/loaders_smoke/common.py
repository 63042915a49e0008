"""Shared driver for the loader smoke CLIs.

These scripts mirror the reference's manual integration tests
(`/root/reference/tests/test_{vctk,voicebank,dsd100}.py`): given a real
preprocessed dataset's meta directory, build both loaders and iterate every
batch to completion — success is simply the absence of exceptions.
"""

import importlib

from tqdm import tqdm


def iterate_dataset(dataset_module: str, meta_dir: str, batch_size: int,
                    num_workers: int = 4, fix_len: int = 0):
    """Exhaust the train and valid loaders of ``data.meta.<dataset_module>``."""
    mod = importlib.import_module(
        'pytorch_sound_tpu.data.meta.' + dataset_module)
    train_loader, valid_loader = mod.get_datasets(
        meta_dir, batch_size, num_workers, fix_len=fix_len)

    for name, loader in (('train', train_loader), ('valid', valid_loader)):
        print('Loop {} datasets'.format(name))
        for _ in tqdm(loader):
            pass
    print('All of the dataset is loaded successfully.')
