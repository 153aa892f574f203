"""Entry points: Stage-1 training and Stage-2 validation."""
