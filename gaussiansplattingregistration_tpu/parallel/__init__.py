"""Multi-device execution: meshes, shardings, sharded rasterization/eval.

The reference is single-GPU (SURVEY.md §2.9); this package is the TPU-native
scaling story: GSPMD meshes with a `splat` axis (tensor-parallel over the N
gaussians + tile-sharded compositing) and a `data` axis (cameras/images),
with XLA collectives over ICI.
"""
