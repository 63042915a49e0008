from pytorch_sound_tpu.models.vocoders import hifi_gan  # noqa: F401 (registration side effect)
