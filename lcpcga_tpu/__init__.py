"""lcpcga_tpu — TPU-native learned compression of point cloud geometry
and attributes in a single model.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
mic-rud/Learned-Compression-of-Point-Cloud-Geometry-and-Attributes
(arXiv:2408.00599), re-architected TPU-first: fixed-capacity sorted
sparse tensors, gather-GEMM sparse convolutions, jit-able entropy
models, a C++ rANS coder, and shard_map data parallelism.
"""

__version__ = "0.1.0"
