"""Compute kernels: geometry, robust statistics, image processing,
detectors/descriptors, and matching primitives. All pure JAX, batched,
fixed-shape, mask-carrying."""
