"""pointcloudpdf_tpu — a TPU-native point-cloud perception framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
JinfengX/PointCloudPDF (CVPR 2024 "PDF", a Pointcept fork): closed-set
point-cloud perception, open-world segmentation with probability-driven
unknown recognition, and incremental learning — redesigned TPU-first with
static-shape padded batches, fused vector attention, and SPMD data
parallelism over jax.sharding meshes.
"""

__version__ = "0.1.0"
