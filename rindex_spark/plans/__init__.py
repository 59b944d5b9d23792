"""Job-level plumbing: micro-batch op folding, checkpoint manifests."""
