"""Host-side utilities: test data generation, caches, throughput formatting."""
