"""tpu-lz4: a TPU-native LZ4 codec framework (JAX/XLA/Pallas).

Capability map to the reference (`infidob/lz4`, r132 + LZ4_SG fork):

* ``lz4_tpu.block``   -- block codec (reference lib/lz4.c, lib/lz4.h)
* ``lz4_tpu.hc``      -- high-compression codec (reference lib/lz4hc.c)
* ``lz4_tpu.frame``   -- LZ4F frame layer (reference lib/lz4frame.c)
* ``lz4_tpu.sg``      -- scatter-gather layer (reference lib/lz4sg.c)
* ``lz4_tpu.stream``  -- streaming dictionaries (reference lz4.c:920-1085)
* ``lz4_tpu.ops``     -- host oracles (numpy/pure-python reference semantics)
* ``lz4_tpu.kernels`` -- Pallas TPU kernels (the production compute path)
* ``lz4_tpu.parallel``-- device-mesh sharding of blocks/frames
* ``lz4_tpu.utils``   -- datagen, CLI helpers
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # Some site customizations (e.g. the axon TPU plugin) re-select their
    # platform at interpreter startup even when the user exported
    # JAX_PLATFORMS=cpu; re-assert the user's explicit choice before any
    # backend is initialized so a down/absent accelerator cannot hang a
    # CPU-requested run.  Only the cpu case is re-asserted: naming an
    # accelerator platform here can RACE its plugin registration (the
    # config lookup then fails with "not in the list of known backends"
    # and device paths silently fall back to host).
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from . import spec  # noqa: F401
