"""Device meshes, shard_map steps, psum reductions, multi-host init."""
