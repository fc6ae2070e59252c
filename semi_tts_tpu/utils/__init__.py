"""Host-side utilities: timing, metrics, visualization, misc helpers."""
