"""Train/validation splitting helpers.

Parity target: `/root/reference/pytorch_sound/data/meta/commons.py` —
speaker-stratified when a label column exists, random otherwise.
"""

import random
from collections import defaultdict
from typing import Tuple

from pandas import DataFrame


def split_train_val_frame(data_frame: DataFrame, val_rate: float = 0.1,
                          label_key: str = 'speaker') -> Tuple[DataFrame, DataFrame]:
    """Split a meta frame; stratified per ``label_key`` value when present."""
    total_len = len(data_frame)
    idx_list = list(range(total_len))

    if label_key in data_frame:
        by_label = defaultdict(list)
        for idx, label in enumerate(data_frame[label_key].values):
            by_label[label].append(idx)
        for key in by_label:
            random.shuffle(by_label[key])
        train_idx, val_idx = [], []
        for key in by_label:
            split_idx = int(len(by_label[key]) * val_rate)
            train_idx.extend(by_label[key][split_idx:])
            val_idx.extend(by_label[key][:split_idx])
    else:
        random.shuffle(idx_list)
        split_idx = int(total_len * val_rate)
        train_idx = idx_list[split_idx:]
        val_idx = idx_list[:split_idx]

    return data_frame.iloc[train_idx], data_frame.iloc[val_idx]
