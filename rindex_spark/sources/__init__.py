"""Sources/sinks: pages table IO, point extraction, testdata registry."""
