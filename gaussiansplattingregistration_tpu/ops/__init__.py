"""Numeric ops: 3D math, SH, SE(3), rasterization, registration primitives."""
