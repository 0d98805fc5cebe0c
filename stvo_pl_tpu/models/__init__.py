"""Pipeline models: per-frame feature extraction, pose optimization, and the
VO engine (frame handler) as jit-compiled state machines."""
