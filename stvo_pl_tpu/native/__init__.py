"""Native (C++) host-side components: prefetching image loader with
PGM/PNG decode and rectification remap."""
