"""Host-side utilities: datasets, metrics, synthetic scenes, telemetry,
visualization."""
