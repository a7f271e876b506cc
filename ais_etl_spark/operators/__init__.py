"""Engine operators: LWW dedup, CDC apply plans, training-data ops."""
