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

# Honor STF_UNET_PLATFORM as a hard platform pin. JAX_PLATFORMS alone can
# be overridden by eagerly self-registering PJRT plugins (observed with
# the axon TPU plugin: a subprocess exported JAX_PLATFORMS=cpu yet hung in
# the plugin's backend init when the chip link was down); jax.config wins
# over plugin discovery, so CLIs/tests spawned with this variable are
# immune to plugin ordering and dead-link hangs.
import os as _os

if _os.environ.get("STF_UNET_PLATFORM"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["STF_UNET_PLATFORM"])
    except RuntimeError:
        pass  # backend already initialized by the embedding process
