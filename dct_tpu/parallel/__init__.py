"""Multi-chip / multi-host sharded encode: meshes, stripes, collectives."""
