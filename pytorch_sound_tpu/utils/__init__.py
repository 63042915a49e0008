"""Host-side utilities: logging, wav I/O, text codecs, DSP helpers, plotting."""
