"""unopose_tpu — a TPU-native (JAX/XLA/Pallas) framework for unseen-object
6DoF pose estimation from a single unposed RGB-D reference image.

Re-designed from scratch for TPU with the capability surface of the
UNOPose reference (CVPR'25): frozen DINOv2 ViT-B/14 feature lifting,
coarse/fine cross point-matching transformers with overlap score heads,
and a soft-correspondence weighted-Procrustes pose solver.

Layout:
    ops/       pure-JAX + Pallas numeric kernels (FPS, ball query, LRF, SVD-free
               Procrustes, geometry)
    models/    flax.linen model components (ViT backbone, matchers, solvers)
    parallel/  mesh/sharding helpers (data-parallel pjit over ICI/DCN)
    engine/    train/inference loops, schedules, checkpointing
    data/      host-side dataset readers + device-side preprocessing tails
    utils/     config, logging, metric writers
"""

__version__ = "0.1.0"
