"""Host-side utilities: checkpoint conversion, audio/video I/O, assets."""
