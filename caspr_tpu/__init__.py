"""caspr-tpu: a TPU-native (JAX/XLA/Pallas) framework for canonical
spatiotemporal point cloud representations.

Re-designed from scratch for TPU with the capabilities of the reference
CaSPR pipeline (davrempe/caspr): T-NOCS canonicalization, latent Neural ODE
advection, and conditional-CNF decoding of dynamic point cloud sequences.

Layering (bottom to top):
  caspr_tpu.nn       -- minimal functional parameter/module layer
  caspr_tpu.ops      -- point-cloud kernels (FPS, ball query, 3-NN interp,
                        Chamfer, approx-EMD) and from-scratch ODE solvers
                        (dopri5 + adjoint), XLA + Pallas implementations
  caspr_tpu.models   -- pure-function models (PointNet, PointNet++,
                        TPointNet2, LatentODE, CNF, CaSPR)
  caspr_tpu.data     -- dataset / loader for dynamic point cloud sequences
  caspr_tpu.parallel -- device-mesh (pjit/GSPMD) data parallelism
  caspr_tpu.train    -- jit-compiled train/eval steps, checkpointing, logging
  caspr_tpu.utils    -- config/CLI plumbing, transforms, evaluations
  caspr_tpu.compat   -- PyTorch checkpoint conversion
"""

__version__ = "0.1.0"
