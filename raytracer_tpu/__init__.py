"""raytracer_tpu — a TPU-native path-tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``raytracer-server`` (a Rust CPU path tracer + WebSocket streaming server):

- TOML scene format -> SoA geometry/material arrays (``models.loader``)
- wavefront Monte-Carlo path tracer with next-event estimation, Russian
  roulette and optional MIS (``render.integrator``)
- batched sphere/plane/triangle intersection + flattened BVH (``ops``)
- multi-chip tile sharding over a ``jax.sharding.Mesh`` (``parallel``)
- asyncio WebSocket server speaking the reference's exact binary wire
  protocol (``server``)

The compute path is pure JAX (jit/shard_map/Pallas); hot host-side paths
(OBJ parsing, wire-format packing) have C++ implementations in ``native/``.
"""

__version__ = "0.1.0"

from raytracer_tpu.config import RenderConfig, Epsilons  # noqa: F401
