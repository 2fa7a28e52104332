"""Device compute primitives (cell binning, neighbor lists, pair/bonded
force evaluation, careful reductions).  These are the TPU-native equivalents
of the reference's CUDA kernels (hoomd/CellList*.cu, md/NeighborListGPU*.cu,
md/PotentialPairGPU.cuh, ...)."""
