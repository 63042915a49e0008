"""One-off converter: torch HiFi-GAN checkpoints -> native msgpack params.

The reference bundles torch checkpoints under ``assets/vocoders/*.pt``
(`/root/reference/pytorch_sound/interface/hifi_gan.py:21-26`); this toolkit is
torch-free at runtime, so checkpoints are converted offline into folded
(weight-norm-removed) flax parameter trees serialized with msgpack.

Usage:
    python -m pytorch_sound_tpu.scripts.convert_hifigan in.pt out.msgpack

torch is imported lazily — it is only needed to run this tool.
"""

import re
from typing import Any, Dict

import numpy as np
from flax import serialization


def fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """weight = g * v / ||v|| with the norm over all dims but 0 (torch dim=0)."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True) + 1e-12)
    return (g * v / norm).astype(np.float32)


def convert_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torch generator state dict -> flax params tree (folded weights).

    Key mapping: ``ups.0.*`` -> ``ups_0``; ``resblocks.2.convs1.1.*`` ->
    ``resblocks_2/convs1_1``; weight_g/weight_v pairs folded to ``weight``.
    """
    arrays = {k: np.asarray(t.detach().cpu().numpy() if hasattr(t, 'detach') else t)
              for k, t in state_dict.items()}

    # group by module path
    modules: Dict[str, Dict[str, np.ndarray]] = {}
    for key, val in arrays.items():
        path, _, leaf = key.rpartition('.')
        modules.setdefault(path, {})[leaf] = val

    params: Dict[str, Any] = {}
    for path, leaves in modules.items():
        # torch 'ups.0' -> 'ups_0'; 'resblocks.1.convs2.0' -> ('resblocks_1', 'convs2_0')
        parts = path.split('.')
        flax_parts = []
        i = 0
        while i < len(parts):
            if i + 1 < len(parts) and re.fullmatch(r'\d+', parts[i + 1]):
                flax_parts.append('%s_%s' % (parts[i], parts[i + 1]))
                i += 2
            else:
                flax_parts.append(parts[i])
                i += 1

        node = params
        for p in flax_parts:
            node = node.setdefault(p, {})

        if 'weight_g' in leaves and 'weight_v' in leaves:
            node['weight'] = fold_weight_norm(leaves['weight_g'], leaves['weight_v'])
        elif 'weight' in leaves:
            node['weight'] = leaves['weight'].astype(np.float32)
        if 'bias' in leaves:
            node['bias'] = leaves['bias'].astype(np.float32)
    return {'params': params}


def convert_file(in_path: str, out_path: str, state_key: str = 'generator') -> str:
    import torch   # tool-only dependency
    chkpt = torch.load(in_path, map_location='cpu')
    state_dict = chkpt[state_key] if state_key in chkpt else chkpt
    params = convert_state_dict(state_dict)
    with open(out_path, 'wb') as w:
        w.write(serialization.msgpack_serialize(params))
    return out_path


if __name__ == '__main__':
    import sys
    convert_file(*sys.argv[1:3])
    print('wrote', sys.argv[2])
