"""Command-line interface (the reference's Qt GUI surface, re-expressed)."""
