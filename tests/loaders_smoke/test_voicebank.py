"""VoiceBank loader smoke CLI (parity: `/root/reference/tests/test_voicebank.py`).

    python tests/loaders_smoke/test_voicebank.py <meta_dir>
"""

from common import iterate_dataset


def test_voicebank(meta_dir: str):
    iterate_dataset('voice_bank', meta_dir, batch_size=32)


if __name__ == '__main__':
    from pytorch_sound_tpu.utils.cli import fire_like
    fire_like(test_voicebank)
