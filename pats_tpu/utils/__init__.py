"""Host-side utilities: metrics, geometry, profiling."""
