"""LibriTTS download/extract/restructure helpers."""
