"""facegen — a TPU-native face-generation GAN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
aleju/face-generator (Lua/Torch7, single-GPU). Everything here is built
TPU-first:

- NHWC tensor layout everywhere (XLA's native conv layout on TPU).
- Pure-functional models: explicit parameter/state pytrees, no globals
  (the reference communicates through Lua globals, train.lua:89-94).
- Whole-epoch `jax.jit`-compiled training with `lax.scan`; GAN control
  flow (the D-accuracy gate, reference adversarial.lua:154-178) is
  carried state + masked updates, never Python branching.
- Data parallelism via `jax.shard_map` over a `jax.sharding.Mesh` with
  `psum` gradient all-reduce over ICI (the reference has no parallelism,
  SURVEY.md section 2.3).
- HBM-resident data: the epoch pool lives on device; no per-step
  host<->device round-trips (the reference crosses on every
  forward/backward through nn.Copy sandwiches, nn_utils.lua:328-395).
"""

__version__ = "0.1.0"

from facegen import config as config  # noqa: F401
