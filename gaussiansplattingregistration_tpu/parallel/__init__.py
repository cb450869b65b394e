"""Multi-device execution: meshes, shardings, sharded rasterization/eval.

The reference is single-GPU (SURVEY.md §2.9); this package is the TPU-native
scaling story: GSPMD meshes with a `splat` axis (tensor-parallel over the N
gaussians + tile-sharded compositing) and a `data` axis (cameras/images),
with XLA collectives over ICI.

Two compositing strategies over the splat axis:
* sharded_raster — all_gather records, composite own tile slab (simple,
  O(N_total) per-device memory);
* compositor — depth-bucketed all_to_all + associative partial-composite
  merge (§5.7; O(N/D) per-device memory, scales N past one device).
"""
