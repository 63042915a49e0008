"""End-to-end training configurations (VoiceBank, DSD100, Maestro)."""
