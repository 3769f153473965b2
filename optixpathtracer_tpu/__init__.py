"""optixpathtracer_tpu — a TPU-native wavefront path-tracing framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
bipul-mohanto/OptixPathTracer (OptiX 7.5/CUDA): progressive, interactive,
foveated Monte-Carlo path tracing — with the hardware BVH replaced by an
on-device LBVH + wavefront traversal, the megakernel replaced by an SoA
wavefront loop, and multi-GPU tile scaffolding replaced by shard_map over a
TPU device mesh.
"""

__version__ = "0.1.0"
