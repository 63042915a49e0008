"""Logging and host-side multiprocessing helpers.

Parity target: `/root/reference/pytorch_sound/utils/commons.py`.
"""

import logging
from typing import Any, Callable, Dict, List, Tuple

from joblib import Parallel, cpu_count, delayed
from tqdm import tqdm

__all__ = ['LOGGER', 'log', 'get_logger', 'go_multiprocess', 'get_loadable_checkpoint']


def go_multiprocess(worker_func: Callable, inputs: List[Tuple[Any, ...]],
                    num_workers: int = None) -> List[Any]:
    """Run ``worker_func(*args)`` over ``inputs`` with a joblib process pool."""
    if not num_workers:
        num_workers = max(1, cpu_count() // 2)
    return Parallel(n_jobs=num_workers)(
        delayed(worker_func)(*args) for args in tqdm(inputs))


def get_logger(name: str) -> logging.Logger:
    """Get a formatted, non-propagating INFO logger."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        logger.propagate = False
        logger.setLevel(logging.INFO)
        ch = logging.StreamHandler()
        ch.setLevel(logging.INFO)
        ch.setFormatter(logging.Formatter(
            '[%(asctime)s] [%(name)s] [%(levelname)s] %(message)s'))
        logger.addHandler(ch)
    return logger


LOGGER = get_logger('main')


def log(msg: str):
    """Log through the global logger."""
    LOGGER.info(msg)


def get_loadable_checkpoint(checkpoint: Dict[str, Any]) -> Dict[str, Any]:
    """Strip torch-DataParallel ``module.`` prefixes from a flat state dict.

    Kept for compatibility when importing converted torch checkpoints
    (reference: `utils/commons.py:55-66`).
    """
    return {(k[len('module.'):] if k.startswith('module.') else k): v
            for k, v in checkpoint.items()}
