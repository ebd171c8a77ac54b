"""stf_unet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
DCE-MRI breast-tumor segmentation with the capabilities of the PyTorch
reference STF-Unet (XiangFeng-Wen/STF-Unet).

Built from scratch, TPU-first:
  * NHWC layouts, bf16 compute policy, XLA conv/reduce_window primitives.
  * Per-pixel temporal LSTM fusion as a `lax.scan` over fused gate matmuls.
  * Data parallelism via `jax.sharding.Mesh` + NamedSharding (GSPMD).
  * Pallas kernels for the hot ops (fused LSTM cell, Tofts quadrature).
  * A vmapped extended-Tofts pharmacokinetic fitter (Ktrans/ve/vp maps).

Reference behavior citations use `ref:<file>:<line>` pointing into the
read-only reference checkout.
"""

__version__ = "0.1.0"
