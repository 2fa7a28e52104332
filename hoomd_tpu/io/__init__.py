"""File I/O backends: frame store (GSD-role checkpoint/trajectory format)
and DCD trajectories."""
