"""IO, logging, caching, and host-side utilities."""
