"""Scale-out: device meshes, multi-sequence batching, and distributed
windowed bundle adjustment.

The reference is a single-process library whose only concurrency is four
fork-join std::async sites (SURVEY.md §2.4).  Here scale-out is first-class:
`vmap` batches sequences per chip, `shard_map` over a Mesh distributes
batches (DP) and BA keyframe blocks (the CP analogue) with XLA collectives —
psum/all_gather over ICI replace the reference's absent comm backend.
"""
