"""Engine operators: kNN graph, range join, reverse kNN, stats, tiling,
dedup, ANN, text analysis, multimodal plumbing."""
