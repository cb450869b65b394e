"""High-level drivers: multiscale registration, photometric pose optimization,
evaluation, merging."""
